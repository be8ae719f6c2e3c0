from qqq_tpu.serve import kv_cache
