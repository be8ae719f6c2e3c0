"""Ascending-B probe for the paged decode-write fault threshold.

One process, jitted calls at B = 8, 9, ... 16 against a fixed nb=193 pool;
the process dies at the first faulting B, so the last "ok" line marks the
safe ceiling.  B=8 first doubles as a device-health check (known-good)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _tpu_watchdog import progress  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from qqq_tpu.kernels.kv_write import paged_decode_write_int8  # noqa: E402

nkv, hd, bs = 32, 128, 128
nbmax = 12
nb = 193

key = jax.random.PRNGKey(0)
kp = jax.random.randint(key, (nb, nkv, bs, hd), -127, 128, jnp.int32
                        ).astype(jnp.int8)
ks = jax.random.uniform(key, (nb, nkv, bs), jnp.float32)
vp, vs = kp + 1, ks + 1

print(jax.devices(), flush=True)
progress("devices")

for B in range(8, 17):
    tab = np.zeros((B, nbmax), np.int32)
    for b in range(B):
        for j in range(nbmax):
            blk = 1 + b * nbmax + j
            tab[b, j] = blk if blk < nb else 0
    tab = jnp.asarray(tab)
    clen = jnp.asarray(np.full((B,), 1024, np.int32))
    kn = jax.random.normal(key, (B, 1, nkv, hd), jnp.bfloat16)
    vn = jax.random.normal(key, (B, 1, nkv, hd), jnp.bfloat16)
    print(f"B={B} start", flush=True)
    out = jax.jit(paged_decode_write_int8)(kp, ks, vp, vs, kn, vn, tab, clen)
    print(f"B={B} ok sum={int(jnp.sum(out[0].astype(jnp.int32)))}",
          flush=True)
    progress(f"B={B} ok")
print("ALL OK", flush=True)
