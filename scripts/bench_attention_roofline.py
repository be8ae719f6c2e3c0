"""Attention-kernel roofline table (VERDICT r2 item 6): µs, TFLOPS, and
% of v5e bf16 peak for the INT8-KV flash kernels, like the GEMMs have.

Prefill (causal, T=S):  FLOPs = 2·B·nh·T·S·hd  (QKᵀ + PV, causal half)
Decode  (T=1):          bandwidth-bound — report GB/s vs ~819 GB/s HBM.

Run: python scripts/bench_attention_roofline.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from qqq_tpu.kernels.attention import (
    decode_attention_int8,
    flash_attention_int8,
    flash_decode_attention_int8,
)
from qqq_tpu.utils.benchmark import measure_op

V5E_BF16_PEAK = 197e12  # TFLOPS (per chip)
HBM_GBS = 819.0

B, nh, nkv, hd = 1, 32, 32, 128


def mk(S, seed=0):
    key = jax.random.PRNGKey(seed)
    k8 = jax.random.randint(key, (B, nkv, S, hd), -127, 128, jnp.int8)
    v8 = jax.random.randint(key, (B, nkv, S, hd), -127, 128, jnp.int8)
    ks = jnp.full((B, nkv, S), 0.01, jnp.float32)
    vs = jnp.full((B, nkv, S), 0.01, jnp.float32)
    return k8, ks, v8, vs


def main():
    print("backend:", jax.default_backend(), flush=True)
    print("# prefill (causal, T=S) — bf16 QK^T vs int8-MXU QK^T")
    for T in (1024, 2048, 4096):
        S = T
        k8, ks, v8, vs = mk(S)
        q = jax.random.normal(jax.random.PRNGKey(1), (B, nh, T, hd),
                              jnp.float32)
        clen = jnp.asarray([0], jnp.int32)
        for qk8 in (False, True):
            f = lambda q_, k_, ks_, v_, vs_: flash_attention_int8(
                q_, k_, ks_, v_, vs_, clen, causal=True,
                qk_int8=qk8, interpret=False)
            t = measure_op(f, (q, k8, ks, v8, vs))
            flops = 2.0 * B * nh * T * S * hd  # 2 matmuls x 2 flop/MAC x T·S/2 causal pairs
            tf = flops / t / 1e12
            tag = "qk-int8" if qk8 else "qk-bf16"
            print(f"prefill T=S={T} {tag}: {t*1e6:7.1f} us  "
                  f"{tf:6.1f} TFLOPS "
                  f"({100*tf*1e12/V5E_BF16_PEAK:4.1f}% bf16 peak)",
                  flush=True)

    print("# decode (T=1, bandwidth-bound)")
    for S in (4096, 8192, 16384, 32768):
        k8, ks, v8, vs = mk(S)
        q = jax.random.normal(jax.random.PRNGKey(1), (B, nh, hd),
                              jnp.float32)
        clen = jnp.asarray([S], jnp.int32)
        bytes_ = 2 * B * nkv * S * hd + 8 * B * nkv * S

        def report(name, t):
            gbs = bytes_ / t / 1e9
            print(f"decode S={S} {name}: {t*1e6:7.1f} us  {gbs:5.0f} GB/s "
                  f"({100*gbs/HBM_GBS:4.1f}% HBM)", flush=True)

        if S <= 8192:
            f = lambda q_, k_, ks_, v_, vs_: decode_attention_int8(
                q_, k_, ks_, v_, vs_, clen, interpret=False)
            report("whole-cache", measure_op(f, (q, k8, ks, v8, vs)))
        g = lambda q_, k_, ks_, v_, vs_: flash_decode_attention_int8(
            q_, k_, ks_, v_, vs_, clen, interpret=False)
        report("s-tiled    ", measure_op(g, (q, k8, ks, v8, vs)))


if __name__ == "__main__":
    main()
