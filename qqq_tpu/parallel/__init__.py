from qqq_tpu.parallel.shard import (
    make_mesh,
    param_pspecs,
    cache_pspec,
    shard_params,
    tp_forward_fn,
)
