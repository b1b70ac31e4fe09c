"""redisearch_tpu.aux — auxiliary services (suggest, spellcheck, highlight, checkpoint)."""
