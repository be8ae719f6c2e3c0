"""Paged vs contiguous INT8-KV attention on the real chip.

The paged kernel's only difference from the contiguous flash kernel is the
table-driven DMA addressing (kernels/attention.py:paged_flash_attention_int8)
— this measures what that indirection costs at decode and chunked-prefill
shapes across block sizes, plus the end-to-end paged-engine serving rate.

Run on TPU:  python scripts/bench_paged_attention.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from qqq_tpu.kernels.attention import (        # noqa: E402
    decode_attention_auto, flash_attention_int8,
    paged_decode_attention_int8, paged_flash_attention_int8,
)
from qqq_tpu.utils.benchmark import measure_op  # noqa: E402

B, nh, nkv, hd = 1, 32, 32, 128


def mk_pool(S, bs, shuffle=True, B=B):
    """A contiguous cache and the same contents scattered into a pool."""
    key = jax.random.PRNGKey(0)
    k8 = jax.random.randint(key, (B, nkv, S, hd), -127, 128, jnp.int8)
    v8 = jax.random.randint(key, (B, nkv, S, hd), -127, 128, jnp.int8)
    ks = jnp.full((B, nkv, S), 0.01, jnp.float32)
    vs = jnp.full((B, nkv, S), 0.01, jnp.float32)
    nb = S // bs
    rng = np.random.default_rng(0)
    order = np.arange(1, B * nb + 1)
    if shuffle:
        rng.shuffle(order)
    tables = order.reshape(B, nb).astype(np.int32)
    kp = np.zeros((1 + B * nb, nkv, bs, hd), np.int8)
    vp = np.zeros_like(kp)
    ksp = np.zeros((1 + B * nb, nkv, bs), np.float32)
    vsp = np.zeros_like(ksp)
    k8n, v8n = np.asarray(k8), np.asarray(v8)
    ksn, vsn = np.asarray(ks), np.asarray(vs)
    for b in range(B):
        for s in range(nb):
            blk = tables[b, s]
            kp[blk] = k8n[b, :, s * bs:(s + 1) * bs]
            vp[blk] = v8n[b, :, s * bs:(s + 1) * bs]
            ksp[blk] = ksn[b, :, s * bs:(s + 1) * bs]
            vsp[blk] = vsn[b, :, s * bs:(s + 1) * bs]
    return (k8, ks, v8, vs,
            jnp.asarray(kp), jnp.asarray(ksp), jnp.asarray(vp),
            jnp.asarray(vsp), jnp.asarray(tables))


# the ENGINE decode comparison: head-batched paged decode kernel (one
# (n_kv, bs, hd) slab DMA per (request, block) cell) vs the contiguous
# auto-dispatch (whole-cache kernel <=8k, S-tiled beyond)
for B_ in (1, 4):
    for S in (2048, 8192):
        for bs in (128, 256):
            (k8, ks, v8, vs, kp, ksp, vp, vsp, tab) = mk_pool(S, bs, B=B_)
            clen = jnp.full((B_,), S, jnp.int32)
            qd = jax.random.normal(jax.random.PRNGKey(3), (B_, nh, hd),
                                   jnp.float32)
            f_c = lambda q_, a, b_, c, d: decode_attention_auto(
                q_, a, b_, c, d, clen)
            f_p = lambda q_, a, b_, c, d, t: paged_decode_attention_int8(
                q_, a, b_, c, d, t, clen)
            tc = measure_op(f_c, (qd, k8, ks, v8, vs))
            tp = measure_op(f_p, (qd, kp, ksp, vp, vsp, tab))
            print(f"DECODE B={B_} S={S} bs={bs}: contiguous-auto "
                  f"{tc*1e6:.1f} us, paged {tp*1e6:.1f} us "
                  f"({tp/tc:.2f}x)", flush=True)

for S in (2048, 8192, 16384):
    for bs in (128, 256, 512):
        (k8, ks, v8, vs, kp, ksp, vp, vsp, tab) = mk_pool(S, bs)
        clen = jnp.asarray([S - 1], jnp.int32)
        # decode (T=1)
        q = jax.random.normal(jax.random.PRNGKey(1), (B, nh, 1, hd),
                              jnp.float32)
        f_c = lambda q_, a, b_, c, d: flash_attention_int8(
            q_, a, b_, c, d, clen, causal=False, sblk=bs, interpret=False)
        f_p = lambda q_, a, b_, c, d, t: paged_flash_attention_int8(
            q_, a, b_, c, d, t, clen, causal=False, interpret=False)
        tc = measure_op(f_c, (q, k8, ks, v8, vs))
        tp = measure_op(f_p, (q, kp, ksp, vp, vsp, tab))
        print(f"decode S={S} bs={bs}: contiguous {tc*1e6:.1f} us, "
              f"paged {tp*1e6:.1f} us ({tp/tc:.2f}x)", flush=True)

# chunked prefill: T=512 against S=4096
S, T = 4096, 512
for bs in (128, 512):
    (k8, ks, v8, vs, kp, ksp, vp, vsp, tab) = mk_pool(S, bs)
    clen = jnp.asarray([S - T - 1], jnp.int32)
    q = jax.random.normal(jax.random.PRNGKey(2), (B, nh, T, hd), jnp.float32)
    f_c = lambda q_, a, b_, c, d: flash_attention_int8(
        q_, a, b_, c, d, clen, causal=True, sblk=bs, interpret=False)
    f_p = lambda q_, a, b_, c, d, t: paged_flash_attention_int8(
        q_, a, b_, c, d, t, clen, causal=True, interpret=False)
    tc = measure_op(f_c, (q, k8, ks, v8, vs))
    tp = measure_op(f_p, (q, kp, ksp, vp, vsp, tab))
    print(f"chunk prefill T={T} S={S} bs={bs}: contiguous {tc*1e6:.1f} us, "
          f"paged {tp*1e6:.1f} us ({tp/tc:.2f}x)", flush=True)
