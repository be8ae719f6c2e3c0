"""Fused flash-decode attention over the INT8 KV cache.

The jnp fallback (serve/kv_cache.read) dequantizes the whole cache through
XLA: read int8 (S·hd) → write bf16 (2×) → read bf16 (2×) per head — ~5× the
necessary HBM traffic.  This kernel streams int8 K/V blocks + their fp32
scales straight into VMEM and does the whole softmax there.

Schedule notes (v5e): grid-step overhead is ~0.5 µs, so cells must be large —
the grid is (batch, kv-head blocks) with a whole head-block's cache
(``hblk × S × hd`` int8, VMEM-budgeted) per cell and a static loop over heads
inside; decode scores for one head are only (g, S) fp32, so no online-softmax
tiling is needed.  GQA: the g = n_heads/n_kv query heads of a kv head form
the (g, hd) lhs of the score matmul.

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
    clen_ref,   # (B,) int32 scalar-prefetch: valid tokens per batch row
    q_ref,      # (1, hblk, g, hd) f32 — queries, pre-scaled by 1/√hd
    k_ref,      # (1, hblk, S, hd) int8
    ks_ref,     # (1, hblk, 1, S) f32 — lane-major: applied to the scores
    v_ref,      # (1, hblk, S, hd) int8
    vs_ref,     # (1, hblk, 1, S) f32 — folded into the probabilities
    o_ref,      # (1, hblk, g, hd) f32
    *,
    hblk: int,
):
    b = pl.program_id(0)
    S = k_ref.shape[2]

    for h in range(hblk):
        q = q_ref[0, h]  # (g, hd)
        scores = jax.lax.dot_general(
            q,
            k_ref[0, h].astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * ks_ref[0, h]  # (g, S) · (1, S)
        valid = (
            jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) < clen_ref[b]
        )
        scores = jnp.where(valid, scores, _NEG_INF)
        m = jnp.max(scores, axis=1, keepdims=True)
        p = jnp.exp(scores - m)
        p = (p / jnp.sum(p, axis=1, keepdims=True)) * vs_ref[0, h]
        o_ref[0, h] = jax.lax.dot_general(
            p,
            v_ref[0, h].astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def _pick_hblk(nkv: int, S: int, hd: int) -> int:
    """Largest divisor of n_kv whose K+V block stays within ~6 MB of VMEM."""
    budget = 6 * 1024 * 1024 // (2 * S * (hd + 8))
    for h in range(min(nkv, max(budget, 1)), 0, -1):
        if nkv % h == 0:
            return h
    return 1


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention_int8(
    q: jax.Array,        # (B, n_heads, hd) — current-step queries, RoPE'd
    k_cache: jax.Array,  # (B, n_kv, S, hd) int8 (current k already written)
    k_scale: jax.Array,  # (B, n_kv, S) f32
    v_cache: jax.Array,  # (B, n_kv, S, hd) int8
    v_scale: jax.Array,  # (B, n_kv, S) f32
    cache_len: jax.Array,  # (B,) int32 — valid tokens INCLUDING current
    *,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Returns (B, n_heads, hd) attention output in q.dtype."""
    B, nh, hd = q.shape
    nkv, S = k_cache.shape[1], k_cache.shape[2]
    g = nh // nkv
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    hblk = _pick_hblk(nkv, S, hd)

    qg = (
        q.reshape(B, nkv, g, hd).astype(jnp.float32)
        / jnp.sqrt(jnp.float32(hd))
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nkv // hblk),
        in_specs=[
            pl.BlockSpec((1, hblk, g, hd), lambda b, h, clen: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hblk, S, hd), lambda b, h, clen: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hblk, 1, S), lambda b, h, clen: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hblk, S, hd), lambda b, h, clen: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hblk, 1, S), lambda b, h, clen: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, hblk, g, hd), lambda b, h, clen: (b, h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )

    out = pl.pallas_call(
        functools.partial(_decode_attn_kernel, hblk=hblk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, nkv, g, hd), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(
        cache_len.astype(jnp.int32), qg,
        k_cache, k_scale[:, :, None, :], v_cache, v_scale[:, :, None, :],
    )

    return out.reshape(B, nh, hd).astype(q.dtype)
