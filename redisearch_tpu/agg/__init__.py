"""redisearch_tpu.agg"""
