"""Isolate the per-step KV WRITE cost: paged table-scatter vs slot cache.

The paged bs=4 serving TPOT gap (18.4 vs ~11.3 ms) exceeds what the
attention kernel ratio (1.18x) explains — suspect the decode write
`pool.at[phys, :, off].set(...)` (indices on non-adjacent dims 0 and 2)
lowers to something far from an in-place row write.

Run on TPU:  python scripts/bench_paged_write.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from qqq_tpu.serve import kv_cache, paged_kv  # noqa: E402
from qqq_tpu.utils.benchmark import measure_op  # noqa: E402


class _Cfg:
    num_key_value_heads = 32
    head_dim = 128
    num_hidden_layers = 1


for B in (1, 4, 16):
    S, bs = 1408, 128
    nbmax = S // bs
    cfg = _Cfg()
    pool = paged_kv.init(cfg, 1 + B * nbmax, bs, quantized=True)[0]
    slot = kv_cache.init(cfg, B, max_len=S, quantized=True,
                         dtype=jnp.bfloat16)[0]
    tables = jnp.asarray(
        np.arange(1, 1 + B * nbmax, dtype=np.int32).reshape(B, nbmax)
    )
    k = jax.random.normal(jax.random.PRNGKey(0), (B, 1, 32, 128),
                          jnp.bfloat16)
    offs = jnp.full((B,), 1000, jnp.int32)

    # measure_op reduces array outputs — return the updated k plane only
    # (same plane for both paths, so the ratio is apples-to-apples)
    tp = measure_op(
        lambda k_, o: paged_kv.write(pool, k_, k_, o, tables)["k"], (k, offs)
    )
    ts = measure_op(
        lambda k_, o: kv_cache.write(slot, k_, k_, o)["k"], (k, offs)
    )
    print(f"B={B}: paged write {tp*1e6:.1f} us, slot write {ts*1e6:.1f} us "
          f"({tp/ts:.2f}x)  [non-donated]", flush=True)
