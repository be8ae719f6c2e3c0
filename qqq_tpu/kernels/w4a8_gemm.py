"""Pallas TPU W4A8 GEMM: D = (A_int8 @ W_int4) · scales.

TPU-native replacement for the reference's Marlin-style CUDA kernel
(csrc/qqq_gemm.cu:240-820).  Design notes — what maps where:

* Marlin's striped SM partitioning, ``cp.async`` pipeline, XOR-swizzled shared
  memory and lock-guarded global reduction hand-schedule data flow on a GPU.
  On TPU all of that is the Mosaic pipeline: an (m, n, k) grid whose
  k-dimension is sequential ("arbitrary"), automatic double-buffered DMA of
  the A / packed-W blocks, and a VMEM accumulator living across the k loop.
  No locks, no workspace, no reduction buffer.
* Nibble extraction (csrc/qqq_gemm.cu:146-210's lop3/prmt tricks) is two
  mask ops + a free int32→int8 bitcast in the layout of core/packing.py
  (~0.5 VPU ops/weight).  Codes are stored offset-unsigned (q+8); the ``-8``
  is folded into the matmul as ``dot(a, u) - 8·rowsum(a)`` so no per-element
  sign-extension happens at all.
* Per-group path: instead of requantizing INT4 → INT8 in-register through
  fp16 double scales (a CUDA-ism — tensor cores need one int8 operand for the
  whole K reduction), we take an exact int32 MXU dot per 128-row group and
  accumulate fp32-scaled partial sums in a VMEM scratch.  More accurate than
  the reference (zero requant noise) and cheaper.
* The fp32 epilogue ``· s_channel · s_token`` mirrors qqq_gemm.cu:680-726.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qqq_tpu.core.packing import PACK_BLOCK
from qqq_tpu.core.quant import (
    quantize_activations_per_token,
    s_extra_from_group_scales,
)

_NIBBLE_MASK = 0x0F0F0F0F  # python int: avoids a captured traced constant

FUSE_ACT_QUANT = False  # see w4a8_linear — slower on v5e, kept for study


def _unpack_u8(w32, block_k: int):
    """(block_k//8, bn) int32 words → per-block list of (64, bn) uint-nibble
    int8 pieces in k order: [lo_b, hi_b] for each 128-row block b."""
    mask = jnp.full((), _NIBBLE_MASK, jnp.int32)
    lo = w32 & mask
    hi = jax.lax.shift_right_logical(w32, 4) & mask
    lo8 = pltpu.bitcast(lo, jnp.int8)  # (block_k//2, bn); row 4r+i = byte i
    hi8 = pltpu.bitcast(hi, jnp.int8)
    blocks = []
    for b in range(block_k // PACK_BLOCK):
        blocks.append((lo8[b * 64 : b * 64 + 64], hi8[b * 64 : b * 64 + 64]))
    return blocks


def _requant_w8(w32, s_frac_ref, block_k: int):
    """In-kernel INT4 → INT8 requantization through the double scale
    ``s_frac = s_group / s_extra`` (jnp oracle:
    core.quant.requantize_group_weights_int8; reference analogue:
    csrc/qqq_gemm.cu:166-210's dequant_per_group, minus the fp16 detour).

    The subtraction ``u − 8`` happens BEFORE the scale multiply so the f32
    product rounds once, exactly like the oracle's ``q · s`` — folding the
    offset into an FMA (``u·s − 8s``) would round twice and drift by an ulp
    on ties.  Codes stay in [-8, 7] ⇒ |w8| ≤ 127·8/7 < 146; the clamp covers
    the (never-produced-by-sym) −8 code."""
    pieces = []
    for b, (lo_b, hi_b) in enumerate(_unpack_u8(w32, block_k)):
        s = s_frac_ref[b, :][None, :].astype(jnp.float32)  # (1, n)
        for half in (lo_b, hi_b):
            qf = half.astype(jnp.float32) - 8.0  # exact small ints
            w8 = jnp.round(qf * s)               # single rounding
            pieces.append(jnp.clip(w8, -127.0, 127.0).astype(jnp.int8))
    return jnp.concatenate(pieces, axis=0)       # (block_k, n) int8


def _w4a8_requant_group_kernel(
    a_ref,      # (bm, bk) int8
    w_ref,      # (bk//8, bn) int32 packed
    s_frac_ref, # (Gp ≥ bk//128, bn) f32 double scales (sublane-padded)
    s_tok_ref,  # (bm, 1) f32
    s_ex_ref,   # (1, bn) f32 scale_extra
    out_ref,    # (bm, bn) out_dtype
    acc_ref,    # (bm, bn) int32 scratch
    *,
    block_k: int,
    out_dtype,
):
    """Per-group GEMM, requant variant for the compute-bound prefill regime.

    The exact per-group kernel pays ``Gt`` fp32 scale-accumulate passes over
    the (bm, bn) tile per k-tile (VPU work ∝ Gt·bm·bn — about half the g128
    prefill time at bm=512).  Here the weights are requantized INT4 → INT8
    in-register (VPU work ∝ bk·bn, independent of bm) and the whole k-tile
    takes ONE int32 MXU dot with a single per-channel epilogue — the
    reference's double-scale scheme (gptq.py:204-217, qqq_gemm.cu:166-210),
    reached for the same reason it exists there: one int8 operand for the
    whole K reduction keeps the matrix unit busy.  Decode stays on the exact
    kernel (requant costs ~½ bit of weight precision; at small M the exact
    path is HBM-bound anyway)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w8 = _requant_w8(w_ref[:], s_frac_ref, block_k)
    acc_ref[:] += jax.lax.dot_general(
        a_ref[:], w8,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        out = acc_ref[:].astype(jnp.float32) * s_ex_ref[:] * s_tok_ref[:]
        out_ref[:] = out.astype(out_dtype)


def _w4a8_channel_kernel(
    a_ref,      # (bm, bk) int8
    w_ref,      # (bk//8, bn) int32 packed
    asum_ref,   # (bm, 1) int32: rowsum of the FULL a row (all K)
    s_tok_ref,  # (bm, 1) f32
    s_ch_ref,   # (1, bn) f32
    out_ref,    # (bm, bn) out_dtype
    acc_ref,    # (bm, bn) int32 scratch
    *,
    block_k: int,
    out_dtype,
):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    pieces = []
    for lo_b, hi_b in _unpack_u8(w_ref[:], block_k):
        pieces += [lo_b, hi_b]
    u8 = jnp.concatenate(pieces, axis=0)  # (bk, bn) nibbles [0,15]

    acc_ref[:] += jax.lax.dot_general(
        a_ref[:],
        u8,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        corr = acc_ref[:] - 8 * asum_ref[:]  # undo the +8 code offset
        out = corr.astype(jnp.float32) * s_ch_ref[:] * s_tok_ref[:]
        out_ref[:] = out.astype(out_dtype)


def _w4a8_group_kernel(
    a_ref,      # (bm, bk) int8
    w_ref,      # (bk//8, bn) int32 packed
    s_g_ref,    # (Gp ≥ bk//128, bn) f32/bf16 full group scales (sublane-padded)
    bsum_ref,   # (1, bm, Gp) int32: this tile's per-group rowsums of a
    s_tok_ref,  # (bm, 1) f32
    out_ref,    # (bm, bn) out_dtype
    facc_ref,   # (bm, bn) f32 scratch
    *,
    block_k: int,
    out_dtype,
):
    """The +8 code-offset is undone per group with the INTEGER identity
    ``dot(a, u) − 8·rowsum(a) = dot(a, q4)`` *before* the fp32 scale — the
    int32 subtraction is exact, whereas hoisting the correction to the
    epilogue (Σ s_g·dot(a,u) − 8·Σ s_g·rowsum) cancels two ~100× larger fp32
    sums and loses ~1% of the output at K ≈ 11008.

    ``s_g_ref`` is read in its STORED dtype (bf16 from the pipeline, f32
    from Marlin-imported checkpoints) and upcast in-register — the HBM
    stream carries the narrow type, mirroring the reference's fp16
    ``s_group`` storage (qlinear_marlin.py:110-122)."""
    k = pl.program_id(2)
    n_groups = block_k // PACK_BLOCK

    @pl.when(k == 0)
    def _():
        facc_ref[:] = jnp.zeros_like(facc_ref)

    for b, (lo_b, hi_b) in enumerate(_unpack_u8(w_ref[:], block_k)):
        u8 = jnp.concatenate([lo_b, hi_b], axis=0)  # (128, bn)
        d = jax.lax.dot_general(
            a_ref[:, b * PACK_BLOCK : (b + 1) * PACK_BLOCK],
            u8,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        bs = bsum_ref[0, :, b : b + 1]  # (bm, 1) int32, static lane index
        s_g = s_g_ref[b, :].astype(jnp.float32)
        facc_ref[:] += (d - 8 * bs).astype(jnp.float32) * s_g[None, :]

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = (facc_ref[:] * s_tok_ref[:]).astype(out_dtype)


def _w4a8_fused_channel_kernel(
    x_ref,      # (bm, K) bf16 — raw activations; quantized in-kernel
    w_ref,      # (K//8, bn) int32 packed
    s_ch_ref,   # (1, bn) f32
    out_ref,    # (bm, bn) out_dtype
    *,
    block_k: int,
    out_dtype,
):
    """Single-k-tile variant with the dynamic per-token activation
    quantization fused into the kernel prologue: reads bf16 activations
    directly, so the XLA-level absmax/scale/cast fusions (and their per-op
    launch latency, ~5 µs each at decode sizes) disappear."""
    xf = x_ref[:].astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
    s_tok = jnp.maximum(absmax, 1e-30) / 127.0
    a = jnp.clip(jnp.round(xf / s_tok), -128, 127).astype(jnp.int8)
    asum = jnp.sum(a.astype(jnp.int32), axis=1, keepdims=True)

    pieces = []
    for lo_b, hi_b in _unpack_u8(w_ref[:], block_k):
        pieces += [lo_b, hi_b]
    u8 = jnp.concatenate(pieces, axis=0)
    acc = jax.lax.dot_general(
        a, u8,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = (acc - 8 * asum).astype(jnp.float32) * s_ch_ref[:] * s_tok
    out_ref[:] = out.astype(out_dtype)


def _w4a8_fused_group_kernel(
    x_ref,      # (bm, K) bf16
    w_ref,      # (K//8, bn) int32 packed
    s_g_ref,    # (K//128, bn) f32/bf16 full group scales
    out_ref,    # (bm, bn) out_dtype
    *,
    block_k: int,
    out_dtype,
):
    xf = x_ref[:].astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
    s_tok = jnp.maximum(absmax, 1e-30) / 127.0
    a = jnp.clip(jnp.round(xf / s_tok), -128, 127).astype(jnp.int8)

    facc = jnp.zeros((a.shape[0], out_ref.shape[1]), jnp.float32)
    for b, (lo_b, hi_b) in enumerate(_unpack_u8(w_ref[:], block_k)):
        u8 = jnp.concatenate([lo_b, hi_b], axis=0)  # (128, bn)
        a_b = a[:, b * PACK_BLOCK : (b + 1) * PACK_BLOCK]
        d = jax.lax.dot_general(
            a_b, u8,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        bsum = jnp.sum(a_b.astype(jnp.int32), axis=1, keepdims=True)
        s_g = s_g_ref[b, :].astype(jnp.float32)
        facc = facc + (d - 8 * bsum).astype(jnp.float32) * s_g[None, :]
    out_ref[:] = (facc * s_tok).astype(out_dtype)


def _max_bk(K: int, bn: int) -> int:
    """Largest divisor-of-K k-tile with the unpacked bk·bn int8 tile ≤ ~3 MB
    (VMEM headroom for Mosaic's double buffering)."""
    budget = 3 * 1024 * 1024 // bn
    d_max = K // PACK_BLOCK
    return max(
        (
            PACK_BLOCK * d
            for d in range(1, d_max + 1)
            if d_max % d == 0 and PACK_BLOCK * d <= budget
        ),
        default=PACK_BLOCK,
    )


def _w4a8_channel_glu_kernel(
    a_ref,      # (bm, bk) int8
    w_ref,      # (bk//8, 2·bn) int32 packed [gate_j | up_j] interleave
    asum_ref,   # (bm, 1) int32
    s_tok_ref,  # (bm, 1) f32
    s_ch_ref,   # (1, 2·bn) f32
    out_ref,    # (bm, bn) out_dtype — silu(gate)·up
    acc_ref,    # (bm, 2·bn) int32 scratch
    *,
    block_k: int,
    out_dtype,
):
    """Per-channel W4A8 GEMM with a fused GLU epilogue: the packed weight
    holds gate and up columns tile-interleaved (see ``fuse_glu_layout``), so
    each grid cell accumulates both halves and writes ``silu(g)·u`` — the
    (M, I) gate/up intermediates never touch HBM (saves ~88 MB of traffic
    per layer at M=1024, I=11008)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    pieces = []
    for lo_b, hi_b in _unpack_u8(w_ref[:], block_k):
        pieces += [lo_b, hi_b]
    u8 = jnp.concatenate(pieces, axis=0)
    acc_ref[:] += jax.lax.dot_general(
        a_ref[:], u8,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        bn = out_ref.shape[1]
        corr = acc_ref[:] - 8 * asum_ref[:]
        scaled = corr.astype(jnp.float32) * s_ch_ref[:] * s_tok_ref[:]
        g = scaled[:, :bn]
        u = scaled[:, bn:]
        out_ref[:] = (g * jax.lax.logistic(g) * u).astype(out_dtype)


def _w4a8_requant_group_glu_kernel(
    a_ref,      # (bm, bk) int8
    w_ref,      # (bk//8, 2·bn) int32 packed [gate_j | up_j] interleave
    s_frac_ref, # (Gp, 2·bn) f32 double scales (sublane-padded)
    s_tok_ref,  # (bm, 1) f32
    s_ex_ref,   # (1, 2·bn) f32 scale_extra
    out_ref,    # (bm, bn) out_dtype — silu(gate)·up
    acc_ref,    # (bm, 2·bn) int32 scratch
    *,
    block_k: int,
    out_dtype,
):
    """GLU epilogue over the requant per-group path (see
    _w4a8_requant_group_kernel for the requant rationale)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w8 = _requant_w8(w_ref[:], s_frac_ref, block_k)
    acc_ref[:] += jax.lax.dot_general(
        a_ref[:], w8,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        bn = out_ref.shape[1]
        scaled = acc_ref[:].astype(jnp.float32) * s_ex_ref[:] * s_tok_ref[:]
        g = scaled[:, :bn]
        u = scaled[:, bn:]
        out_ref[:] = (g * jax.lax.logistic(g) * u).astype(out_dtype)


def _w4a8_group_glu_kernel(
    a_ref,      # (bm, bk) int8
    w_ref,      # (bk//8, 2·bn) int32 packed
    s_g_ref,    # (Gp, 2·bn) f32/bf16, upcast in-register
    bsum_ref,   # (1, bm, Gp) int32
    s_tok_ref,  # (bm, 1) f32
    out_ref,    # (bm, bn) out_dtype
    facc_ref,   # (bm, 2·bn) f32 scratch
    *,
    block_k: int,
    out_dtype,
):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        facc_ref[:] = jnp.zeros_like(facc_ref)

    for b, (lo_b, hi_b) in enumerate(_unpack_u8(w_ref[:], block_k)):
        u8 = jnp.concatenate([lo_b, hi_b], axis=0)
        d = jax.lax.dot_general(
            a_ref[:, b * PACK_BLOCK : (b + 1) * PACK_BLOCK],
            u8,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        bs = bsum_ref[0, :, b : b + 1]
        s_g = s_g_ref[b, :].astype(jnp.float32)
        facc_ref[:] += (d - 8 * bs).astype(jnp.float32) * s_g[None, :]

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        bn = out_ref.shape[1]
        scaled = facc_ref[:] * s_tok_ref[:]
        g = scaled[:, :bn]
        u = scaled[:, bn:]
        out_ref[:] = (g * jax.lax.logistic(g) * u).astype(out_dtype)


def _pick_blocks(M: int, K: int, N: int, per_group: bool, requant: bool = False):
    """Block-shape heuristic (replaces csrc/qqq_gemm.cu:847-916's thread
    config tables).  Swept on v5e in two regimes:

    * decode (small M, HBM-bound): bk=4096/bn=512 reaches ~85% of the HBM
      roofline; bn must divide the 128-padded N (no extra weight traffic).
    * prefill (M ≥ 512, MXU-bound): fewer accumulator passes win — pick the
      (bn, bk) pair maximizing bk (full-K when it fits the ~3 MB tile
      budget), tie-break to the wider bn, and pad N up to a bn multiple
      (the ≤4% extra weight read costs less than a second k-pass).  bm=512
      when the A tile (bm·bk int8) stays within budget: 512×512×4096 runs
      at ~351 TOPS (89% MXU) vs ~324 at bm=256; K=11008 keeps bm=256 with
      a full-K tile (364 TOPS at the down_proj shape).

    The per-group kernel's inner loop is a 128-deep dot + VPU
    scale-accumulate per group, so its cost scales with the number of
    (bm, bn) accumulator updates, not k-passes: it prefers the widest bn
    first (swept: K=11008 g128 at bn=512/bk=5504 is 286 TOPS vs 198 at the
    per-channel-optimal bn=256/bk=11008).  Its s_group tiles are
    sublane-padded in the dispatcher, so no divisibility constraint here."""
    if M >= 512:
        if requant:
            # requant VPU cost (unpack + round + clip, ∝ bk·bn per k-tile) is
            # amortized over bm rows: prefer bm=512 FIRST (cap bk so the
            # 512·bk int8 A-tile fits the ~3 MB budget), then the widest bn.
            # Swept on v5e @M=1024: K=11008 (512,512,5504) 340 TOPS vs 264 at
            # the full-K bm=256 pick; K=4096 (512,512,4096) 335 TOPS.
            bn = 512
            d_max = K // PACK_BLOCK
            bk = max(
                PACK_BLOCK * d
                for d in range(1, d_max + 1)
                if d_max % d == 0 and 512 * PACK_BLOCK * d <= 3 * 1024 * 1024
            )
            return 512, bn, bk
        if per_group:
            bn, bk = max(
                ((b, _max_bk(K, b)) for b in (512, 256, 128)),
                key=lambda t: (t[0], t[1]),
            )
        else:
            bn, bk = max(
                ((b, _max_bk(K, b)) for b in (512, 256, 128)),
                key=lambda t: (t[1], t[0]),
            )
        bm = 512 if M % 512 == 0 and 512 * bk <= 3 * 1024 * 1024 else 256
        return bm, bn, bk
    del per_group
    if M <= 32:
        bm = 32
    elif M <= 128:
        bm = 128
    else:
        bm = 256
    Np = _round_up(N, 128)
    bn = next(b for b in (512, 256, 128) if Np % b == 0)
    return bm, bn, _max_bk(K, bn)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(
    jax.jit,
    static_argnames=("group_size", "out_dtype", "block_m", "block_n", "block_k",
                     "interpret", "requant"),
)
def w4a8_gemm(
    a_q: jax.Array,
    s_token: jax.Array,
    w_packed: jax.Array,
    s_channel: Optional[jax.Array] = None,
    s_group: Optional[jax.Array] = None,
    *,
    group_size: int = -1,
    out_dtype=jnp.bfloat16,
    block_m: int = 0,
    block_n: int = 0,
    block_k: int = 0,
    interpret: Optional[bool] = None,
    requant: Optional[bool] = None,
):
    """W4A8 GEMM host entry (replaces the qqq_gemm launcher, cu:828-1046).

    Args:
      a_q: (M, K) int8 per-token-quantized activations.
      s_token: (M, 1) fp32 per-token scales.
      w_packed: (K//8, N) int32 nibble-packed INT4 weights (core/packing.py).
      s_channel: (N,) fp32 per-channel scales — per-channel path only.
      s_group: (K//128, N) full group scales, f32 or bf16 (the HBM stream
        carries the stored dtype; the kernel upcasts in-register) —
        per-group path only.
      group_size: -1 (per-channel) or 128.
      requant: per-group only.  None (default) = auto: the compute-bound
        prefill regime (M ≥ 512) requantizes INT4 → INT8 in-kernel through
        the double scale (reference numerics, gptq.py:204-217) for a single
        MXU dot per k-tile; small M keeps the exact per-group-dot path.
        True/False forces the choice.
    Returns:
      (M, N) array of ``out_dtype``.
    """
    M, K = a_q.shape
    N = w_packed.shape[1]
    assert w_packed.shape[0] == K // 8, (w_packed.shape, K)
    if group_size == -1:
        assert s_channel is not None
    else:
        assert group_size == PACK_BLOCK, "only g=128 supported (like reference)"
        assert s_group is not None and s_group.shape == (K // group_size, N)
    do_requant = group_size != -1 and (
        requant if requant is not None else M >= 512
    )

    # requant path takes one dot per k-tile like per-channel — use its picks
    bm0, bn0, bk0 = _pick_blocks(
        M, K, N, group_size != -1 and not do_requant, requant=do_requant
    )
    bm = block_m or bm0
    bn = block_n or bn0
    bk = block_k or bk0
    assert bk % PACK_BLOCK == 0 and K % PACK_BLOCK == 0

    # pad N up to a bn multiple (covers both narrow test-model N and the
    # prefill regime's wide-bn preference, e.g. 11008 → 11264 at bn=512)
    Np = _round_up(N, bn)
    if Np != N:
        w_packed = jnp.pad(w_packed, ((0, 0), (0, Np - N)))
        if s_channel is not None:
            s_channel = jnp.pad(s_channel, (0, Np - N), constant_values=1.0)
        if s_group is not None:
            s_group = jnp.pad(
                s_group, ((0, 0), (0, Np - N)), constant_values=1.0
            )

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    Mp = _round_up(M, bm)
    if Mp != M:
        a_q = jnp.pad(a_q, ((0, Mp - M), (0, 0)))
        s_token = jnp.pad(s_token, ((0, Mp - M), (0, 0)), constant_values=1.0)
    s_token = s_token.astype(jnp.float32)

    grid = (Mp // bm, Np // bn, K // bk)

    common = dict(
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * K,  # padded dims: the grid runs over Mp×Np
            bytes_accessed=Mp * K + K * Np // 2 + Mp * Np * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )

    if group_size == -1:
        # dtype-reduce: casting a_q to int32 first materializes a 4x
        # copy of the activations (134 MB at M=8192, K=4096)
        asum = jnp.sum(a_q, axis=-1, keepdims=True, dtype=jnp.int32)
        out = pl.pallas_call(
            functools.partial(
                _w4a8_channel_kernel, block_k=bk, out_dtype=out_dtype
            ),
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bk // 8, bn), lambda i, j, k: (k, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bn), lambda i, j, k: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
            **common,
        )(
            a_q,
            w_packed,
            asum,
            s_token,
            s_channel.reshape(1, Np).astype(jnp.float32),
        )
    elif do_requant:
        # Mosaic needs the scale tile's sublane count 8-divisible (see the
        # exact path below for the padding rationale)
        Gt = bk // PACK_BLOCK
        Gp = _round_up(Gt, 8)
        n_t = K // bk
        s_g32 = s_group.astype(jnp.float32)
        s_extra = s_extra_from_group_scales(s_g32)  # (Np,) f32
        s_frac = s_g32 / s_extra[None, :]
        if Gp != Gt:
            sf_tiles = s_frac.reshape(n_t, Gt, Np)
            sf_tiles = jnp.pad(sf_tiles, ((0, 0), (0, Gp - Gt), (0, 0)))
            s_frac = sf_tiles.reshape(n_t * Gp, Np)
        out = pl.pallas_call(
            functools.partial(
                _w4a8_requant_group_kernel, block_k=bk, out_dtype=out_dtype
            ),
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bk // 8, bn), lambda i, j, k: (k, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Gp, bn), lambda i, j, k: (k, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bn), lambda i, j, k: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
            **common,
        )(
            a_q,
            w_packed,
            s_frac,
            s_token,
            s_extra.reshape(1, Np),
        )
    else:
        bsum = jnp.sum(  # (Mp, K//128) per-128-block rowsums of a
            a_q.reshape(Mp, K // PACK_BLOCK, PACK_BLOCK), axis=-1,
            dtype=jnp.int32
        )
        # s_group stays in its stored dtype (bf16/f32) — upcast in-kernel
        # Mosaic needs the s_group tile's sublane count 8-divisible: pad each
        # k-tile's group rows from Gt = bk/128 up to Gp (K=11008 → Gt=43,
        # Gp=48); the kernel only reads the first Gt rows of each tile.
        # bsum gets the matching tile-major layout (n_tiles, Mp, Gp) so the
        # kernel can take a STATIC lane slice per group (dynamic lane
        # indexing does not lower).
        Gt = bk // PACK_BLOCK
        Gp = _round_up(Gt, 8)
        n_t = K // bk
        if Gp != Gt:
            sg_tiles = s_group.reshape(n_t, Gt, Np)
            sg_tiles = jnp.pad(sg_tiles, ((0, 0), (0, Gp - Gt), (0, 0)))
            s_group = sg_tiles.reshape(n_t * Gp, Np)
        bsum_t = bsum.reshape(Mp, n_t, Gt)
        if Gp != Gt:
            bsum_t = jnp.pad(bsum_t, ((0, 0), (0, 0), (0, Gp - Gt)))
        bsum_t = jnp.swapaxes(bsum_t, 0, 1)  # (n_t, Mp, Gp)
        out = pl.pallas_call(
            functools.partial(
                _w4a8_group_kernel, block_k=bk, out_dtype=out_dtype
            ),
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bk // 8, bn), lambda i, j, k: (k, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Gp, bn), lambda i, j, k: (k, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bm, Gp), lambda i, j, k: (k, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
            **common,
        )(
            a_q,
            w_packed,
            s_group,
            bsum_t,
            s_token,
        )

    if Mp != M or Np != N:
        out = out[:M, :N]
    return out


def _fused_bn(K: int, N: int) -> int:
    """bn for the single-k-tile fused path, or 0 if K doesn't fit VMEM."""
    if K % PACK_BLOCK != 0:
        return 0
    for bn in (512, 256, 128):
        if N % bn == 0 and K * bn <= 3 * 1024 * 1024:
            return bn
    return 0


@functools.partial(
    jax.jit, static_argnames=("group_size", "out_dtype", "interpret")
)
def w4a8_gemm_fused(
    x: jax.Array,  # (M, K) bf16/f32 raw activations
    w_packed: jax.Array,
    s_channel: Optional[jax.Array] = None,
    s_group: Optional[jax.Array] = None,
    *,
    group_size: int = -1,
    out_dtype=jnp.bfloat16,
    interpret: Optional[bool] = None,
):
    """Single-launch W4A8 linear: activation quantization fused into the
    kernel prologue.  Requires the whole K dim in one tile (see _fused_bn)."""
    M, K = x.shape
    N = w_packed.shape[1]
    Np = _round_up(N, 128)
    if Np != N:
        w_packed = jnp.pad(w_packed, ((0, 0), (0, Np - N)))
        if s_channel is not None:
            s_channel = jnp.pad(s_channel, (0, Np - N), constant_values=1.0)
        if s_group is not None:
            s_group = jnp.pad(s_group, ((0, 0), (0, Np - N)),
                              constant_values=1.0)
    bn = _fused_bn(K, Np)
    assert bn, (K, N)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bm = 32 if M <= 32 else (128 if M <= 128 else 256)
    Mp = _round_up(M, bm)
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))

    grid = (Mp // bm, Np // bn)
    common = dict(
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )
    x_spec = pl.BlockSpec((bm, K), lambda i, j: (i, 0),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((K // 8, bn), lambda i, j: (0, j),
                          memory_space=pltpu.VMEM)
    if group_size == -1:
        assert s_channel is not None
        out = pl.pallas_call(
            functools.partial(
                _w4a8_fused_channel_kernel, block_k=K, out_dtype=out_dtype
            ),
            grid=grid,
            in_specs=[
                x_spec,
                w_spec,
                pl.BlockSpec((1, bn), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            **common,
        )(x, w_packed, s_channel.reshape(1, Np).astype(jnp.float32))
    else:
        assert group_size == PACK_BLOCK and s_group is not None
        out = pl.pallas_call(
            functools.partial(
                _w4a8_fused_group_kernel, block_k=K, out_dtype=out_dtype
            ),
            grid=grid,
            in_specs=[
                x_spec,
                w_spec,
                pl.BlockSpec((K // PACK_BLOCK, bn), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            **common,
        )(x, w_packed, s_group)  # stored dtype; upcast in-kernel
    if Mp != M or Np != N:
        out = out[:M, :N]
    return out


GLU_INTERLEAVE = 256  # gate/up column-tile width baked into the fused layout


def _interleave_cols(a: jax.Array, b: jax.Array, bn: int) -> jax.Array:
    """(R, I) + (R, I) → (R, 2I) as [a_0 b_0 a_1 b_1 ...] tiles of bn cols."""
    R, I = a.shape
    t = I // bn
    return jnp.stack(
        [a.reshape(R, t, bn), b.reshape(R, t, bn)], axis=2
    ).reshape(R, 2 * I)


def fuse_glu_layout(gate: dict, up: dict) -> Optional[dict]:
    """Fuse packed gate/up linears into one GLU weight for
    :func:`w4a8_glu_linear` (inference-time transform; no reference
    analogue — the reference's QuantizedLlamaMLP runs three QuantLinears,
    gptq/models/llama.py:165-341).  Returns None when not fusible."""
    if "w_packed" not in gate or "w_packed" not in up:
        return None
    if "b" in gate or "b" in up:
        return None
    if gate["w_packed"].shape != up["w_packed"].shape:
        return None
    if ("s_group" in gate) != ("s_group" in up):
        return None
    I = gate["w_packed"].shape[1]
    if I % GLU_INTERLEAVE != 0:
        return None
    bn = GLU_INTERLEAVE
    fused = {"w_packed": _interleave_cols(gate["w_packed"], up["w_packed"], bn)}
    if "s_group" in gate:
        fused["s_group"] = _interleave_cols(gate["s_group"], up["s_group"], bn)
    else:
        fused["s_channel"] = _interleave_cols(
            gate["s_channel"].reshape(1, I), up["s_channel"].reshape(1, I), bn
        ).reshape(2 * I)
    return fused


@functools.partial(
    jax.jit, static_argnames=("group_size", "out_dtype", "interpret", "requant")
)
def w4a8_glu_gemm(
    a_q: jax.Array,
    s_token: jax.Array,
    w_glu: jax.Array,       # (K//8, 2I) packed, GLU_INTERLEAVE layout
    s_channel: Optional[jax.Array] = None,  # (2I,)
    s_group: Optional[jax.Array] = None,    # (K//128, 2I)
    *,
    group_size: int = -1,
    out_dtype=jnp.bfloat16,
    interpret: Optional[bool] = None,
    requant: Optional[bool] = None,  # see w4a8_gemm — auto at M ≥ 512
):
    """GLU-fused W4A8 GEMM: returns silu(a·W_gate)·(a·W_up) of shape (M, I)
    without materializing either (M, I) intermediate in HBM."""
    M, K = a_q.shape
    I = w_glu.shape[1] // 2
    bn = GLU_INTERLEAVE
    assert I % bn == 0 and w_glu.shape[0] == K // 8
    bk = _max_bk(K, 2 * bn)
    if M <= 32:
        bm = 32
    elif M <= 128:
        bm = 128
    else:
        bm = 512 if M % 512 == 0 and 512 * bk <= 3 * 1024 * 1024 else 256
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    Mp = _round_up(M, bm)
    if Mp != M:
        a_q = jnp.pad(a_q, ((0, Mp - M), (0, 0)))
        s_token = jnp.pad(s_token, ((0, Mp - M), (0, 0)), constant_values=1.0)
    s_token = s_token.astype(jnp.float32)
    grid = (Mp // bm, I // bn, K // bk)

    common = dict(
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, I), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * 2 * I * K,
            bytes_accessed=Mp * K + K * I + Mp * I * 2,
            transcendentals=Mp * I,
        ),
        interpret=interpret,
    )
    a_spec = pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((bk // 8, 2 * bn), lambda i, j, k: (k, j),
                          memory_space=pltpu.VMEM)
    stok_spec = pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0),
                             memory_space=pltpu.VMEM)

    if group_size == -1:
        assert s_channel is not None and s_channel.shape == (2 * I,)
        asum = jnp.sum(a_q, axis=-1, keepdims=True, dtype=jnp.int32)
        out = pl.pallas_call(
            functools.partial(
                _w4a8_channel_glu_kernel, block_k=bk, out_dtype=out_dtype
            ),
            grid=grid,
            in_specs=[
                a_spec,
                w_spec,
                pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0),
                             memory_space=pltpu.VMEM),
                stok_spec,
                pl.BlockSpec((1, 2 * bn), lambda i, j, k: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[pltpu.VMEM((bm, 2 * bn), jnp.int32)],
            **common,
        )(
            a_q, w_glu, asum, s_token,
            s_channel.reshape(1, 2 * I).astype(jnp.float32),
        )
    elif group_size != -1 and (requant if requant is not None else M >= 512):
        assert group_size == PACK_BLOCK
        assert s_group is not None and s_group.shape == (K // PACK_BLOCK, 2 * I)
        Gt = bk // PACK_BLOCK
        Gp = _round_up(Gt, 8)
        n_t = K // bk
        s_g32 = s_group.astype(jnp.float32)
        s_extra = s_extra_from_group_scales(s_g32)  # (2I,) f32
        s_frac = s_g32 / s_extra[None, :]
        if Gp != Gt:
            sf_tiles = s_frac.reshape(n_t, Gt, 2 * I)
            sf_tiles = jnp.pad(sf_tiles, ((0, 0), (0, Gp - Gt), (0, 0)))
            s_frac = sf_tiles.reshape(n_t * Gp, 2 * I)
        out = pl.pallas_call(
            functools.partial(
                _w4a8_requant_group_glu_kernel, block_k=bk,
                out_dtype=out_dtype,
            ),
            grid=grid,
            in_specs=[
                a_spec,
                w_spec,
                pl.BlockSpec((Gp, 2 * bn), lambda i, j, k: (k, j),
                             memory_space=pltpu.VMEM),
                stok_spec,
                pl.BlockSpec((1, 2 * bn), lambda i, j, k: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[pltpu.VMEM((bm, 2 * bn), jnp.int32)],
            **common,
        )(a_q, w_glu, s_frac, s_token, s_extra.reshape(1, 2 * I))
    else:
        assert group_size == PACK_BLOCK
        assert s_group is not None and s_group.shape == (K // PACK_BLOCK, 2 * I)
        # s_group stays in its stored dtype (bf16/f32) — upcast in-kernel
        bsum = jnp.sum(a_q.reshape(Mp, K // PACK_BLOCK, PACK_BLOCK),
                       axis=-1, dtype=jnp.int32)
        Gt = bk // PACK_BLOCK
        Gp = _round_up(Gt, 8)
        n_t = K // bk
        if Gp != Gt:
            sg_tiles = s_group.reshape(n_t, Gt, 2 * I)
            sg_tiles = jnp.pad(sg_tiles, ((0, 0), (0, Gp - Gt), (0, 0)))
            s_group = sg_tiles.reshape(n_t * Gp, 2 * I)
        bsum_t = bsum.reshape(Mp, n_t, Gt)
        if Gp != Gt:
            bsum_t = jnp.pad(bsum_t, ((0, 0), (0, 0), (0, Gp - Gt)))
        bsum_t = jnp.swapaxes(bsum_t, 0, 1)
        out = pl.pallas_call(
            functools.partial(
                _w4a8_group_glu_kernel, block_k=bk, out_dtype=out_dtype
            ),
            grid=grid,
            in_specs=[
                a_spec,
                w_spec,
                pl.BlockSpec((Gp, 2 * bn), lambda i, j, k: (k, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bm, Gp), lambda i, j, k: (k, i, 0),
                             memory_space=pltpu.VMEM),
                stok_spec,
            ],
            scratch_shapes=[pltpu.VMEM((bm, 2 * bn), jnp.float32)],
            **common,
        )(a_q, w_glu, s_group, bsum_t, s_token)

    if Mp != M:
        out = out[:M]
    return out


def w4a8_glu_linear(
    x: jax.Array,
    glu: dict,
    *,
    out_dtype=jnp.bfloat16,
    interpret: Optional[bool] = None,
    requant: Optional[bool] = None,
) -> jax.Array:
    """silu(x·W_gate)·(x·W_up) through the GLU-fused kernel.  ``glu`` comes
    from :func:`fuse_glu_layout`."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    a_q, s_tok = quantize_activations_per_token(x2)
    group_size = 128 if "s_group" in glu else -1
    out = w4a8_glu_gemm(
        a_q, s_tok, glu["w_packed"], glu.get("s_channel"),
        glu.get("s_group"), group_size=group_size, out_dtype=out_dtype,
        interpret=interpret, requant=requant,
    )
    return out.reshape(*lead, -1)


def w4a8_linear(
    x: jax.Array,
    w_packed: jax.Array,
    s_channel: Optional[jax.Array] = None,
    s_group: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    *,
    group_size: int = -1,
    out_dtype=jnp.bfloat16,
    interpret: Optional[bool] = None,
    requant: Optional[bool] = None,
) -> jax.Array:
    """Quantized linear layer: dynamic per-token act quant + W4A8 GEMM + bias.

    The TPU analogue of QuantLinear.forward (qlinear_marlin.py:270-288).
    Small-M (decode) calls take the fully-fused single-launch path when K
    fits one tile; otherwise activation quant runs in XLA before the k-tiled
    kernel.  Accepts ``x`` of any leading shape ``(..., K)``.
    """
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    M = x2.shape[0]
    N = w_packed.shape[1]
    # measured on v5e: the act-quant-fused single-launch kernel LOSES to the
    # two-step path at the model level (XLA fuses the quantization into the
    # rms-norm producer, while the fused kernel re-reads + re-quantizes x per
    # n-tile); keep it opt-in
    if FUSE_ACT_QUANT and M <= 64 and _fused_bn(K, _round_up(N, 128)):
        out = w4a8_gemm_fused(
            x2, w_packed, s_channel, s_group,
            group_size=group_size, out_dtype=out_dtype, interpret=interpret,
        )
    else:
        a_q, s_tok = quantize_activations_per_token(x2)
        out = w4a8_gemm(
            a_q, s_tok, w_packed, s_channel, s_group,
            group_size=group_size, out_dtype=out_dtype, interpret=interpret,
            requant=requant,
        )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.reshape(*lead, -1)
