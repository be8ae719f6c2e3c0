"""Bisect the B at which paged_decode_write_int8 trips the TPU backend."""

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


def run(B, nb):
    key = jax.random.PRNGKey(B)
    kp = jax.random.randint(key, (nb, nkv, bs, hd), -127, 128, jnp.int32
                            ).astype(jnp.int8)
    ks = jax.random.uniform(key, (nb, nkv, bs), jnp.float32)
    vp, vs = kp + 1, ks + 1
    tab = np.zeros((B, nbmax), np.int32)
    for b in range(B):
        for j in range(nbmax):
            blk = 1 + b * nbmax + j
            tab[b, j] = blk if blk < nb else 0
    tab = jnp.asarray(tab)
    clen = jnp.asarray(np.full((B,), 1024, np.int32))
    kn = jax.random.normal(key, (B, 1, nkv, hd), jnp.bfloat16)
    vn = jax.random.normal(key, (B, 1, nkv, hd), jnp.bfloat16)
    print(f"B={B} nb={nb} start", flush=True)
    out = jax.jit(paged_decode_write_int8)(kp, ks, vp, vs, kn, vn, tab, clen)
    print(f"B={B} nb={nb} ok sum={int(jnp.sum(out[0].astype(jnp.int32)))}",
          flush=True)
    progress(f"B={B} ok")


if __name__ == "__main__":
    print(jax.devices(), flush=True)
    progress("devices")
    for B in (12, 14, 15, 16):
        run(B, 193)
    run(16, 256)   # pool-size probe at the failing B
    run(16, 192)
    print("ALL OK", flush=True)
