"""redisearch_tpu.utils"""
