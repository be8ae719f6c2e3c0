"""KV cache: fixed-slot layout with optional INT8 quantization.

The reference has no KV-cache machinery of its own (it reuses HF's fp16
DynamicCache); INT8 KV is part of this framework's TPU serving scope
(BASELINE.json configs[3]).

Layout per layer: ``k``/``v`` of shape (B, S, n_kv, head_dim) where slot ``s``
holds the token at position ``s``.  INT8 mode stores per-(b, s, head) symmetric
scales (absmax/127 over head_dim) alongside.  Per-batch write offsets support
continuous batching (each sequence has its own length).
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
            "k": jnp.zeros((batch, max_len, nkv, hd), store_dtype),
            "v": jnp.zeros((batch, max_len, nkv, hd), store_dtype),
        }
        if quantized:
            c["k_scale"] = jnp.zeros((batch, max_len, nkv, 1), jnp.float32)
            c["v_scale"] = jnp.zeros((batch, max_len, nkv, 1), jnp.float32)
        caches.append(c)
    return caches


def _quant(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    xf = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    s = jnp.maximum(s, jnp.finfo(jnp.float32).tiny)
    q = jnp.clip(jnp.round(xf / s), -128, 127).astype(jnp.int8)
    return q, s


def write(
    cache: Dict[str, Any],
    k_new: jax.Array,  # (B, T, n_kv, hd)
    v_new: jax.Array,
    offsets: jax.Array,  # (B,) int32
) -> Dict[str, Any]:
    quantized = "k_scale" in cache

    def upd(buf, val):
        return jax.vmap(
            lambda c, x, off: jax.lax.dynamic_update_slice(c, x, (off, 0, 0))
        )(buf, val, offsets)

    out = dict(cache)
    if quantized:
        kq, ks = _quant(k_new)
        vq, vs = _quant(v_new)
        out["k"] = upd(cache["k"], kq)
        out["v"] = upd(cache["v"], vq)
        out["k_scale"] = upd(cache["k_scale"], ks)
        out["v_scale"] = upd(cache["v_scale"], vs)
    else:
        out["k"] = upd(cache["k"], k_new.astype(cache["k"].dtype))
        out["v"] = upd(cache["v"], v_new.astype(cache["v"].dtype))
    return out


def read(cache: Dict[str, Any], dtype) -> Tuple[jax.Array, jax.Array]:
    if "k_scale" in cache:
        k = (cache["k"].astype(jnp.float32) * cache["k_scale"]).astype(dtype)
        v = (cache["v"].astype(jnp.float32) * cache["v_scale"]).astype(dtype)
        return k, v
    return cache["k"].astype(dtype), cache["v"].astype(dtype)
