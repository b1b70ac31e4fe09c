"""redisearch_tpu.ops"""
