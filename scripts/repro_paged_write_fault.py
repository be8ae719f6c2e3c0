"""Micro-repro for the paged bs=16 FailedPrecondition (r4 q02 / r5 q01).

Drives paged_decode_write_int8 and paged_chunk_write_int8 standalone at the
exact engine shapes of the failing config (llama2-7b geometry, bs=16,
max_len 1536, block 128 -> nb=193, nbmax=12) and of the passing bs=4
config, fetching a scalar after each call to fence execution.  Locates
which kernel (if either) trips the device.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _tpu_watchdog import progress  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from qqq_tpu.kernels.kv_write import (  # noqa: E402
    paged_chunk_write_int8, paged_decode_write_int8,
)

nkv, hd, bs = 32, 128, 128


def pools(nb, key):
    k1, k2 = jax.random.split(key)
    kp = jax.random.randint(k1, (nb, nkv, bs, hd), -127, 128, jnp.int32
                            ).astype(jnp.int8)
    ks = jax.random.uniform(k2, (nb, nkv, bs), jnp.float32)
    return kp, ks


def run(B, nbmax, nb, label):
    key = jax.random.PRNGKey(0)
    kp, ks = pools(nb, key)
    vp, vs = pools(nb, jax.random.PRNGKey(1))

    tab = np.zeros((B, nbmax), np.int32)
    # engine-like tables: row b owns blocks 1 + b*nbmax .. (live prefix)
    for b in range(B):
        for j in range(nbmax):
            blk = 1 + b * nbmax + j
            tab[b, j] = blk if blk < nb else 0
    tab = jnp.asarray(tab)
    clen = jnp.asarray(np.full((B,), 1024, np.int32))

    kn = jax.random.normal(key, (B, 1, nkv, hd), jnp.bfloat16)
    vn = jax.random.normal(key, (B, 1, nkv, hd), jnp.bfloat16)
    print(f"{label} decode_write start", flush=True)
    out = jax.jit(paged_decode_write_int8)(
        kp, ks, vp, vs, kn, vn, tab, clen)
    print(f"{label} decode_write sum={int(jnp.sum(out[0].astype(jnp.int32)))}",
          flush=True)
    progress(f"{label} decode ok")

    T = 512
    knc = jax.random.normal(key, (B, T, nkv, hd), jnp.bfloat16)
    vnc = jax.random.normal(key, (B, T, nkv, hd), jnp.bfloat16)
    off = jnp.asarray(np.full((B,), 512, np.int32))
    print(f"{label} chunk_write start", flush=True)
    out = jax.jit(paged_chunk_write_int8)(kp, ks, vp, vs, knc, vnc, tab, off)
    print(f"{label} chunk_write sum={int(jnp.sum(out[0].astype(jnp.int32)))}",
          flush=True)
    progress(f"{label} chunk ok")


if __name__ == "__main__":
    print(jax.devices(), flush=True)
    progress("devices")
    run(4, 12, 49, "bs4-shape")     # the passing config's shapes
    run(8, 12, 193, "R8-pool193")   # chunk dispatch group at bs=16
    run(16, 12, 193, "bs16-shape")  # the failing config's shapes
    print("ALL OK", flush=True)
