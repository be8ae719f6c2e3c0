"""KV cache: fixed-slot layout with optional INT8 quantization.

The reference has no KV-cache machinery of its own (it reuses HF's fp16
DynamicCache); INT8 KV is part of this framework's TPU serving scope
(BASELINE.json configs[3]).

Layout per layer is **head-major**: ``k``/``v`` of shape
(B, n_kv, S, head_dim), INT8 scales (B, n_kv, S) — slot ``s`` holds the token
at position ``s``.  Head-major puts each (batch, head, s-block) on contiguous
tiles, which is what the fused flash-decode kernel
(kernels/attention.py) streams.  Per-batch write offsets support continuous
batching (each sequence has its own length).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp


def init(
    config, batch: int, max_len: int, *, quantized: bool = True,
    dtype=jnp.bfloat16,
) -> List[Dict[str, Any]]:
    nkv, hd = config.num_key_value_heads, config.head_dim
    store_dtype = jnp.int8 if quantized else dtype
    caches = []
    for _ in range(config.num_hidden_layers):
        c = {
            "k": jnp.zeros((batch, nkv, max_len, hd), store_dtype),
            "v": jnp.zeros((batch, nkv, max_len, hd), store_dtype),
        }
        if quantized:
            c["k_scale"] = jnp.zeros((batch, nkv, max_len), jnp.float32)
            c["v_scale"] = jnp.zeros((batch, nkv, max_len), jnp.float32)
        caches.append(c)
    return caches


def _quant(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-(b, head, pos) symmetric INT8 over head_dim."""
    xf = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    s = jnp.maximum(s, jnp.finfo(jnp.float32).tiny)
    q = jnp.clip(jnp.round(xf / s), -128, 127).astype(jnp.int8)
    return q, s[..., 0]


def write(
    cache: Dict[str, Any],
    k_new: jax.Array,  # (B, T, n_kv, hd)
    v_new: jax.Array,
    offsets: jax.Array,  # (B,) int32
) -> Dict[str, Any]:
    quantized = "k_scale" in cache

    import os
    if (
        quantized and k_new.shape[1] == 1
        and cache["k"].shape[2] % 128 == 0
        and not os.environ.get("QQQ_TPU_KV_WRITE_SCATTER")
    ):
        # decode fast path: in-place Pallas S-tile placement
        # (kernels/kv_write.py) — the vmap'd dynamic_update_slice below
        # lowers to a scatter of n_kv strided slivers per request across
        # four buffers
        from qqq_tpu.kernels.kv_write import slot_decode_write_int8

        kp, ksp, vp, vsp = slot_decode_write_int8(
            cache["k"], cache["k_scale"], cache["v"], cache["v_scale"],
            k_new, v_new, offsets,
        )
        return {**cache, "k": kp, "k_scale": ksp, "v": vp, "v_scale": vsp}

    k_new = jnp.swapaxes(k_new, 1, 2)  # (B, n_kv, T, hd)
    v_new = jnp.swapaxes(v_new, 1, 2)

    def upd(buf, val):  # buf (B, n_kv, S, hd), val (B, n_kv, T, hd)
        return jax.vmap(
            lambda c, x, off: jax.lax.dynamic_update_slice(c, x, (0, off, 0))
        )(buf, val, offsets)

    def upd_s(buf, val):  # buf (B, n_kv, S), val (B, n_kv, T)
        return jax.vmap(
            lambda c, x, off: jax.lax.dynamic_update_slice(c, x, (0, off))
        )(buf, val, offsets)

    out = dict(cache)
    if quantized:
        kq, ks = _quant(k_new)
        vq, vs = _quant(v_new)
        out["k"] = upd(cache["k"], kq)
        out["v"] = upd(cache["v"], vq)
        out["k_scale"] = upd_s(cache["k_scale"], ks)
        out["v_scale"] = upd_s(cache["v_scale"], vs)
    else:
        out["k"] = upd(cache["k"], k_new.astype(cache["k"].dtype))
        out["v"] = upd(cache["v"], v_new.astype(cache["v"].dtype))
    return out


def read(cache: Dict[str, Any], dtype) -> Tuple[jax.Array, jax.Array]:
    """Dequantized full cache in the model's (B, S, n_kv, hd) convention —
    the jnp fallback path; the fused decode kernel reads the raw buffers."""
    if "k_scale" in cache:
        k = cache["k"].astype(jnp.float32) * cache["k_scale"][..., None]
        v = cache["v"].astype(jnp.float32) * cache["v_scale"][..., None]
        k, v = k.astype(dtype), v.astype(dtype)
    else:
        k, v = cache["k"].astype(dtype), cache["v"].astype(dtype)
    return jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2)
