"""Pallas TPU W4A8 GEMM: D = (A_int8 @ dequant(W_int4)) * s_channel * s_token.

TPU-native replacement for the reference's Marlin-style CUDA kernel
(csrc/qqq_gemm.cu:240-820).  Design notes — what maps where:

* Marlin's striped SM partitioning, ``cp.async`` pipeline, XOR-swizzled shared
  memory and lock-guarded global reduction exist to hand-schedule data flow on
  a GPU.  On TPU all of that is the Mosaic pipeline: a (m, n, k) grid whose
  k-dimension is sequential ("arbitrary"), with automatic double-buffered DMA
  of the A / packed-W blocks and an int32 VMEM accumulator that lives across
  the k loop.  No locks, no workspace, no reduction buffer.
* Nibble dequant (csrc/qqq_gemm.cu:146-210's lop3/prmt tricks) becomes two
  shifts + concatenate per 128-row packing block (see core/packing.py).
* The per-group path requantizes INT4 → INT8 in-register with the fp32 double
  scale ``s_group`` (reference keeps fp16 here; we use fp32 — free on the VPU)
  and feeds the MXU with int8 × int8 → int32.
* The fp32 epilogue ``acc · s_channel · s_token`` mirrors qqq_gemm.cu:680-726.

Weight layout: ``w_packed`` is ``(K//2, N) int8`` in the nibble-plane layout of
:mod:`qqq_tpu.core.packing` — chosen so a k-tile is a contiguous packed-row
range and each 128-row block is exactly one g=128 group.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qqq_tpu.core.packing import PACK_BLOCK
from qqq_tpu.core.quant import quantize_activations_per_token

_HALF = PACK_BLOCK // 2


def _unpack_block(p32, b):
    """Sign-extended nibbles of packing block ``b``: two (HALF, bn) int32."""
    pb = p32[b * _HALF : (b + 1) * _HALF, :]
    lo = jax.lax.shift_right_arithmetic(jax.lax.shift_left(pb, 28), 28)
    hi = jax.lax.shift_right_arithmetic(jax.lax.shift_left(pb, 24), 28)
    return lo, hi


def _w4a8_kernel(
    a_ref,       # (bm, bk) int8
    w_ref,       # (bk//2, bn) int8 packed
    s_tok_ref,   # (bm, 1) f32
    s_ch_ref,    # (1, bn) f32
    out_ref,     # (bm, bn) out_dtype
    acc_ref,     # (bm, bn) int32 scratch
    *,
    block_k: int,
    out_dtype,
):
    """Per-channel variant: W4 codes are already the int8 MXU operand."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    p32 = w_ref[:].astype(jnp.int32) & 0xFF
    pieces = []
    for b in range(block_k // PACK_BLOCK):
        lo, hi = _unpack_block(p32, b)
        pieces += [lo.astype(jnp.int8), hi.astype(jnp.int8)]
    w8 = jnp.concatenate(pieces, axis=0)

    acc_ref[:] += jax.lax.dot_general(
        a_ref[:],
        w8,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        out = acc_ref[:].astype(jnp.float32) * s_ch_ref[:] * s_tok_ref[:]
        out_ref[:] = out.astype(out_dtype)


def _w4a8_group_kernel(
    a_ref,       # (bm, bk) int8
    w_ref,       # (bk//2, bn) int8 packed
    s_g_ref,     # (bk//128, bn) f32 double scales
    s_tok_ref,   # (bm, 1) f32
    s_ch_ref,    # (1, bn) f32
    out_ref,     # (bm, bn) out_dtype
    acc_ref,     # (bm, bn) int32 scratch
    *,
    block_k: int,
    out_dtype,
):
    """Per-group variant: in-register INT4 → INT8 requantization.

    ``w8 = clip(round(q4 * s_group), -127, 127)`` per 128-row group, then the
    same int8 MXU matmul + fp32 epilogue as per-channel.
    """
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    p32 = w_ref[:].astype(jnp.int32) & 0xFF
    pieces = []
    for b in range(block_k // PACK_BLOCK):
        lo, hi = _unpack_block(p32, b)
        sg = s_g_ref[b, :][None, :]  # (1, bn) — one group's double scale
        for q in (lo, hi):
            wq = jnp.clip(jnp.round(q.astype(jnp.float32) * sg), -127, 127)
            pieces.append(wq.astype(jnp.int8))
    w8 = jnp.concatenate(pieces, axis=0)

    acc_ref[:] += jax.lax.dot_general(
        a_ref[:],
        w8,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        out = acc_ref[:].astype(jnp.float32) * s_ch_ref[:] * s_tok_ref[:]
        out_ref[:] = out.astype(out_dtype)


def _pick_blocks(M: int, K: int, N: int):
    """Block-shape heuristic (replaces csrc/qqq_gemm.cu:847-916's thread
    config tables): small-M (decode) favors wide N tiles; large-M (prefill)
    favors square tiles that amortize the in-kernel unpack."""
    if M <= 32:
        bm = 32
    elif M <= 128:
        bm = 128
    else:
        bm = 256
    bn = next(b for b in (512, 256, 128) if N % b == 0)
    bk = next(b for b in (1024, 512, 256, 128) if K % b == 0)
    return bm, bn, bk


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(
    jax.jit,
    static_argnames=("group_size", "out_dtype", "block_m", "block_n", "block_k",
                     "interpret"),
)
def w4a8_gemm(
    a_q: jax.Array,
    s_token: jax.Array,
    w_packed: jax.Array,
    s_channel: jax.Array,
    s_group: Optional[jax.Array] = None,
    *,
    group_size: int = -1,
    out_dtype=jnp.bfloat16,
    block_m: int = 0,
    block_n: int = 0,
    block_k: int = 0,
    interpret: Optional[bool] = None,
):
    """W4A8 GEMM host entry (replaces qqq_gemm host launcher, cu:828-1046).

    Args:
      a_q: (M, K) int8 per-token-quantized activations.
      s_token: (M, 1) fp32 per-token scales.
      w_packed: (K//2, N) int8 nibble-packed INT4 weights.
      s_channel: (N,) fp32 per-channel scales (``s_extra`` for per-group).
      s_group: (K//group_size, N) fp32 double scales; None when per-channel.
      group_size: -1 (per-channel) or 128.
    Returns:
      (M, N) array of ``out_dtype``.
    """
    M, K = a_q.shape
    N = w_packed.shape[1]
    assert w_packed.shape[0] == K // 2, (w_packed.shape, K)
    if group_size != -1:
        assert group_size == PACK_BLOCK, "only g=128 supported (like reference)"
        assert s_group is not None and s_group.shape == (K // group_size, N)

    bm0, bn0, bk0 = _pick_blocks(M, K, N)
    bm = block_m or bm0
    bn = block_n or bn0
    bk = block_k or bk0
    assert bk % PACK_BLOCK == 0 and K % PACK_BLOCK == 0

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    Mp = _round_up(M, bm)
    if Mp != M:
        a_q = jnp.pad(a_q, ((0, Mp - M), (0, 0)))
        s_token = jnp.pad(s_token, ((0, Mp - M), (0, 0)), constant_values=1.0)

    s_ch2 = s_channel.reshape(1, N).astype(jnp.float32)
    s_token = s_token.astype(jnp.float32)

    grid = (Mp // bm, N // bn, K // bk)

    in_specs = [
        pl.BlockSpec((bm, bk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
        pl.BlockSpec((bk // 2, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
    ]
    operands = [a_q, w_packed]
    if group_size != -1:
        in_specs.append(
            pl.BlockSpec(
                (bk // PACK_BLOCK, bn), lambda i, j, k: (k, j),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(s_group.astype(jnp.float32))
        kernel = functools.partial(
            _w4a8_group_kernel, block_k=bk, out_dtype=out_dtype
        )
    else:
        kernel = functools.partial(_w4a8_kernel, block_k=bk, out_dtype=out_dtype)
    in_specs += [
        pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
    ]
    operands += [s_token, s_ch2]

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * N * K,
            bytes_accessed=Mp * K + K * N // 2 + Mp * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)

    return out[:M] if Mp != M else out


def w4a8_linear(
    x: jax.Array,
    w_packed: jax.Array,
    s_channel: jax.Array,
    s_group: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    *,
    group_size: int = -1,
    out_dtype=jnp.bfloat16,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Quantized linear layer: dynamic per-token act quant + W4A8 GEMM + bias.

    The TPU analogue of QuantLinear.forward (qlinear_marlin.py:270-288); the
    activation quantization is jnp (XLA fuses it with the producer op).
    Accepts ``x`` of any leading shape ``(..., K)``.
    """
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    a_q, s_tok = quantize_activations_per_token(x2)
    out = w4a8_gemm(
        a_q, s_tok, w_packed, s_channel, s_group,
        group_size=group_size, out_dtype=out_dtype, interpret=interpret,
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.reshape(*lead, -1)
