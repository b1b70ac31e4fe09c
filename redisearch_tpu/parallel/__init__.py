"""redisearch_tpu.parallel"""
