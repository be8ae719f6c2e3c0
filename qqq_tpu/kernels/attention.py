"""Fused flash-decode attention over the INT8 KV cache.

The jnp fallback (serve/kv_cache.read) dequantizes the whole cache through
XLA: read int8 (S·hd) → write bf16 (2×) → read bf16 (2×) per head — ~5× the
necessary HBM traffic.  This kernel streams int8 K/V blocks + their fp32
scales straight into the online-softmax accumulator (flash-decoding), so
attention reads exactly the packed cache once.

Layout: the cache is stored head-major ``(B, n_kv, S, head_dim)`` with scales
``(B, n_kv, S)`` (serve/kv_cache.py) so every grid cell (b, h, s-block) maps
to contiguous VMEM tiles.  GQA: the g = n_heads/n_kv query heads of a kv head
are processed together as the (g, hd) lhs of the score matmul.

No reference analogue — the reference delegates serving (and its fp16
DynamicCache) to vLLM; INT8-KV is this framework's serving scope
(BASELINE.json configs[3]).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _decode_attn_kernel(
    clen_ref,   # (B,) int32 scalar-prefetch: tokens valid per batch row
    q_ref,      # (1, 1, g, hd) f32 — queries of this kv head, pre-scaled
    k_ref,      # (1, 1, bs, hd) int8
    ks_ref,     # (1, 1, bs, 1) f32
    v_ref,      # (1, 1, bs, hd) int8
    vs_ref,     # (1, 1, bs, 1) f32
    o_ref,      # (1, 1, g, hd) f32
    m_ref,      # (g, 1) f32 scratch: running max
    l_ref,      # (g, 1) f32 scratch: running denominator
    acc_ref,    # (g, hd) f32 scratch
    *,
    block_s: int,
):
    b = pl.program_id(0)
    s = pl.program_id(2)

    @pl.when(s == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0, 0]  # (g, hd)
    # dequantize rows in-register: (bs, hd) · (bs, 1) sublane broadcast
    kf = k_ref[0, 0].astype(jnp.float32) * ks_ref[0, 0]
    scores = jax.lax.dot_general(
        q,
        kf,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (g, bs)

    valid = (
        s * block_s
        + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    ) < clen_ref[b]
    scores = jnp.where(valid, scores, _NEG_INF)

    m_prev = m_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(scores - m_new)  # (g, bs)
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
    vf = v_ref[0, 0].astype(jnp.float32) * vs_ref[0, 0]
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p,
        vf,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:] = m_new

    @pl.when(s == pl.num_programs(2) - 1)
    def _():
        o_ref[0, 0] = acc_ref[:] / l_ref[:]


@functools.partial(jax.jit, static_argnames=("block_s", "interpret"))
def decode_attention_int8(
    q: jax.Array,        # (B, n_heads, hd) — current-step queries, RoPE'd
    k_cache: jax.Array,  # (B, n_kv, S, hd) int8 (current k already written)
    k_scale: jax.Array,  # (B, n_kv, S) f32
    v_cache: jax.Array,  # (B, n_kv, S, hd) int8
    v_scale: jax.Array,  # (B, n_kv, S) f32
    cache_len: jax.Array,  # (B,) int32 — valid tokens INCLUDING current
    *,
    block_s: int = 512,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Returns (B, n_heads, hd) attention output in q.dtype."""
    B, nh, hd = q.shape
    nkv, S = k_cache.shape[1], k_cache.shape[2]
    g = nh // nkv
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    block_s = min(block_s, S)
    assert S % block_s == 0, (S, block_s)

    qg = (
        q.reshape(B, nkv, g, hd).astype(jnp.float32)
        / jnp.sqrt(jnp.float32(hd))
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nkv, S // block_s),
        in_specs=[
            pl.BlockSpec((1, 1, g, hd), lambda b, h, s, clen: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_s, hd), lambda b, h, s, clen: (b, h, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_s, 1), lambda b, h, s, clen: (b, h, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_s, hd), lambda b, h, s, clen: (b, h, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_s, 1), lambda b, h, s, clen: (b, h, s, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, g, hd), lambda b, h, s, clen: (b, h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((g, 1), jnp.float32),
            pltpu.VMEM((g, 1), jnp.float32),
            pltpu.VMEM((g, hd), jnp.float32),
        ],
    )

    out = pl.pallas_call(
        functools.partial(_decode_attn_kernel, block_s=block_s),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, nkv, g, hd), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(
        cache_len.astype(jnp.int32), qg,
        k_cache, k_scale[..., None], v_cache, v_scale[..., None],
    )

    return out.reshape(B, nh, hd).astype(q.dtype)
