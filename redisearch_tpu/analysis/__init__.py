"""redisearch_tpu.analysis"""
