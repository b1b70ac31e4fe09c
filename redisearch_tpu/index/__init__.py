"""redisearch_tpu.index"""
