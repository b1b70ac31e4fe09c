"""redisearch_tpu.query"""
