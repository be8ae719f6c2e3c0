"""W4A8 quantization numerics in pure jnp.

This module is the numerical oracle of the framework: every Pallas kernel and
every calibration stage is tested against these functions.

Scheme (mirrors the reference semantics, re-derived for TPU):

* **Activations**: dynamic symmetric per-token INT8 — ``s = absmax / 127``,
  ``q = clip(round(x / s), -128, 127)`` (reference:
  QQQ/gptq/qlinear/qlinear_marlin.py:265-268).
* **Weights, per-channel** (``group_size == in_features``): symmetric INT4 with
  range ±7 and no zero point — ``maxq = 2**(bits-1)-1`` (reference:
  QQQ/gptq/quant.py:35-38, 92-93).
* **Weights, per-group** (``group_size = 128``): affine INT4 on [0, 15] with a
  fixed symmetric zero point of 8 — ``scale = (xmax - xmin)/15``,
  ``zero = (maxq+1)/2`` (reference: QQQ/gptq/quant.py:85-88).  We store the
  *signed* code ``q - 8 ∈ [-8, 7]`` so both schemes pack as signed nibbles.
* **Double scale** (per-group only): the already-int4 weights are re-quantized
  per-channel to INT8 with ``s_extra = absmax / 127``; the kernel then applies
  ``s_group = scale / s_extra`` in-register to requantize INT4 → INT8 before
  the MXU matmul, and ``s_extra`` (fp32) in the epilogue (reference:
  QQQ/gptq/gptq.py:204-217, qlinear_marlin.py:209-210).

Layout convention: weights are ``(K, N) = (in_features, out_features)`` —
activations ``(..., K) @ W → (..., N)``.  (The reference/torch uses ``(N, K)``;
the HF importer transposes.)  Per-channel scales have shape ``(N,)``; per-group
scales ``(K // group_size, N)``.

Deviations from the reference (deliberate, TPU-first):
* All scale math in fp32/fp64 instead of fp16; no fp16-requant step.
  ``s_group`` is STORED bf16 (the TPU-native analogue of the reference's
  fp16 s_group buffer, qlinear_marlin.py:110-122 — halves the scale HBM
  stream at decode); the pipeline rounds scales to bf16 *before* GPTQ code
  selection so the storage rounding is error-feedback-compensated, and the
  kernel upcasts to fp32 in-register before scaling exact int32 group dots.
* No "weight << 4, scale / 16" trick (qlinear_marlin.py:221-226) — that exists
  only for CUDA nibble extraction; TPU sign-extends nibbles with shifts.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class QuantSpec:
    """Static description of a weight quantization scheme.

    ``group_size == -1`` means per-channel (one scale per output channel).
    Mirrors the flag semantics of reference examples/quant_model.py:66-117.
    """

    bits: int = 4
    group_size: int = -1  # -1 = per-channel
    sym: bool = True
    mse: bool = False
    norm: float = 2.4
    grid: int = 100
    maxshrink: float = 0.8

    @property
    def per_channel(self) -> bool:
        return self.group_size == -1

    @property
    def maxq(self) -> int:
        # reference QQQ/gptq/quant.py:35-38
        if self.per_channel and self.sym:
            return 2 ** (self.bits - 1) - 1
        return 2**self.bits - 1

    @property
    def zero_code(self) -> int:
        """Fixed zero point in unsigned code space (0 for per-channel sym)."""
        if self.per_channel and self.sym:
            return 0
        return (self.maxq + 1) // 2


def quantize_activations_per_token(
    x: jax.Array, *, compute_dtype=jnp.float32
) -> Tuple[jax.Array, jax.Array]:
    """Dynamic symmetric per-token INT8 activation quantization.

    Returns ``(q, s)`` with ``q`` int8 of x.shape and ``s`` fp32 of
    ``x.shape[:-1] + (1,)``.  Mirrors qlinear_marlin.py:265-268 (absmax/127,
    round, clamp to [-128, 127]) but in fp32 instead of fp16.
    """
    # abs/max carry no arithmetic — run them in x's own dtype so the f32
    # upcast below has a single consumer and fuses into the elementwise
    # quantize chain.  A shared ``x.astype(f32)`` node (old form) made XLA
    # materialize a full f32 copy of x: +~700 µs at (8192, 4096) on v5e,
    # which halved the measured prefill-GEMM TOPS at ladder batch sizes.
    s = (
        jnp.max(jnp.abs(x), axis=-1, keepdims=True).astype(compute_dtype)
        / 127.0
    )
    s = jnp.maximum(s, jnp.finfo(compute_dtype).tiny)  # guard all-zero rows
    q = jnp.clip(
        jnp.round(x.astype(compute_dtype) / s), -128, 127
    ).astype(jnp.int8)
    return q, s.astype(jnp.float32)


def _minmax_ranges(w: jax.Array, spec: QuantSpec) -> Tuple[jax.Array, jax.Array]:
    """Per-(group,channel) xmin/xmax with the reference's symmetrization.

    ``w`` is (K, N).  Returns arrays of shape (G, N) where G = 1 for
    per-channel.  Mirrors QQQ/gptq/quant.py:68-79.
    """
    K, N = w.shape
    g = K if spec.per_channel else spec.group_size
    wg = w.reshape(K // g, g, N)
    xmin = jnp.minimum(wg.min(axis=1), 0.0)
    xmax = jnp.maximum(wg.max(axis=1), 0.0)
    if spec.sym:
        xmax = jnp.maximum(jnp.abs(xmin), xmax)
        xmin = jnp.where(xmin < 0, -xmax, xmin)
    degenerate = (xmin == 0) & (xmax == 0)
    xmin = jnp.where(degenerate, -1.0, xmin)
    xmax = jnp.where(degenerate, 1.0, xmax)
    return xmin, xmax


def _params_from_ranges(
    xmin: jax.Array, xmax: jax.Array, spec: QuantSpec
) -> Tuple[jax.Array, jax.Array]:
    """scale/zero from ranges (QQQ/gptq/quant.py:85-93)."""
    maxq = spec.maxq
    if spec.per_channel and spec.sym:
        scale = xmax / maxq
        zero = jnp.zeros_like(scale)
    else:
        scale = (xmax - xmin) / maxq
        if spec.sym:
            zero = jnp.full_like(scale, (maxq + 1) / 2)
        else:
            zero = jnp.round(-xmin / scale)
    return scale, zero


def _quantize_codes(
    w: jax.Array, scale: jax.Array, zero: jax.Array, spec: QuantSpec
) -> jax.Array:
    """Unsigned (or signed-sym) integer codes, float dtype (QQQ/gptq/quant.py:5-13)."""
    maxq = spec.maxq
    if spec.per_channel and spec.sym:
        return jnp.clip(jnp.round(w / scale), -maxq, maxq)
    return jnp.clip(jnp.round(w / scale) + zero, 0, maxq)


def _dequantize_codes(
    q: jax.Array, scale: jax.Array, zero: jax.Array, spec: QuantSpec
) -> jax.Array:
    if spec.per_channel and spec.sym:
        return scale * q
    return scale * (q - zero)


def find_params_weight(
    w: jax.Array, spec: QuantSpec
) -> Tuple[jax.Array, jax.Array]:
    """Grid-searched (optional) min/max quantization parameters.

    ``w``: (K, N) fp array.  Returns ``(scale, zero)`` of shape (G, N) with
    G = K // group_size (1 for per-channel).

    The MSE path vectorizes the reference's sequential shrink loop
    (QQQ/gptq/quant.py:95-123: ``p = 1 - i/grid``, error ``Σ|q(x)-x|^norm``)
    with a scan over the grid — same math, batched per (group, channel).
    """
    w = w.astype(jnp.float32)
    K, N = w.shape
    g = K if spec.per_channel else spec.group_size
    xmin0, xmax0 = _minmax_ranges(w, spec)
    scale0, zero0 = _params_from_ranges(xmin0, xmax0, spec)
    if not spec.mse:
        return scale0, zero0

    wg = w.reshape(K // g, g, N)
    maxq = spec.maxq
    n_steps = int(spec.maxshrink * spec.grid)

    def err_for(scale, zero):
        q = (
            jnp.clip(jnp.round(wg / scale[:, None, :]), -maxq, maxq)
            if (spec.per_channel and spec.sym)
            else jnp.clip(jnp.round(wg / scale[:, None, :]) + zero[:, None, :], 0, maxq)
        )
        deq = (
            scale[:, None, :] * q
            if (spec.per_channel and spec.sym)
            else scale[:, None, :] * (q - zero[:, None, :])
        )
        return jnp.sum(jnp.abs(deq - wg) ** spec.norm, axis=1)

    def step(carry, i):
        best_err, best_scale, best_zero = carry
        p = 1.0 - i.astype(jnp.float32) / spec.grid
        xmin1, xmax1 = p * xmin0, p * xmax0
        if spec.per_channel and spec.sym:
            scale1 = xmax1 / maxq
            zero1 = zero0
        else:
            scale1 = (xmax1 - xmin1) / maxq
            zero1 = zero0 if spec.sym else jnp.round(-xmin1 / scale1)
        err = err_for(scale1, zero1)
        better = err < best_err
        return (
            jnp.where(better, err, best_err),
            jnp.where(better, scale1, best_scale),
            jnp.where(better, zero1, best_zero),
        ), None

    init_err = jnp.full((K // g, N), jnp.inf, dtype=jnp.float32)
    (err, scale, zero), _ = jax.lax.scan(
        step, (init_err, scale0, zero0), jnp.arange(n_steps)
    )
    return scale, zero


def quantize_weight_int(
    w: jax.Array, scale: jax.Array, zero: jax.Array, spec: QuantSpec
) -> jax.Array:
    """Quantize to **signed** int8 codes in [-8, 7] (per-group, code - 8) or
    [-7, 7] (per-channel).  These are the values that get nibble-packed."""
    K, N = w.shape
    g = K if spec.per_channel else spec.group_size
    wg = w.astype(jnp.float32).reshape(K // g, g, N)
    q = _quantize_codes(wg, scale[:, None, :], zero[:, None, :], spec)
    if not (spec.per_channel and spec.sym):
        q = q - zero[:, None, :]  # shift to signed: [0,15] - 8 -> [-8,7]
    return q.reshape(K, N).astype(jnp.int8)


def dequantize_weight_int(
    q: jax.Array, scale: jax.Array, spec: QuantSpec
) -> jax.Array:
    """Dequantize signed codes back to fp32.  ``q``: (K, N) int8 signed codes."""
    K, N = q.shape
    g = K if spec.per_channel else spec.group_size
    qg = q.astype(jnp.float32).reshape(K // g, g, N)
    return (qg * scale[:, None, :]).reshape(K, N)


def fake_quantize_weight(
    w: jax.Array, spec: QuantSpec, scale: Optional[jax.Array] = None,
    zero: Optional[jax.Array] = None,
) -> jax.Array:
    """Quantize-dequantize roundtrip (the calibration-time view of a weight)."""
    if scale is None:
        scale, zero = find_params_weight(w, spec)
    q = quantize_weight_int(w, scale, zero, spec)
    return dequantize_weight_int(q, scale, spec)


def int8_channel_scale(w_deq: jax.Array) -> jax.Array:
    """Per-output-channel symmetric INT8 scale over dequantized-int4 weights.

    This is the reference's ``scale_extra`` (QQQ/gptq/gptq.py:204-217):
    8-bit, per-channel, symmetric → ``absmax / 127`` over axis K.
    ``w_deq``: (K, N).  Returns (N,) fp32.
    """
    absmax = jnp.max(jnp.abs(w_deq.astype(jnp.float32)), axis=0)
    absmax = jnp.where(absmax == 0, 1.0, absmax)
    return absmax / 127.0


def double_scale(scale: jax.Array, s_extra: jax.Array) -> jax.Array:
    """Per-group kernel scale ``s_group = scale / s_extra``.

    ``scale``: (G, N) int4 group scales; ``s_extra``: (N,) int8 channel scales.
    Mirrors qlinear_marlin.py:209-210 but kept in fp32 (see module docstring).
    """
    return (scale / s_extra[None, :]).astype(jnp.float32)


def s_extra_from_group_scales(s_group: jax.Array) -> jax.Array:
    """Derive the reference's ``scale_extra`` from FULL group scales alone:
    ``7 · max_g s_group[g, n] / 127``.

    Equal to :func:`int8_channel_scale` over the dequantized weights for any
    ``find_params_weight``-produced quantization: symmetric int4 scales are
    ``absmax/7`` (or MSE-shrunk with codes clipped to ±7), so the group with
    the largest scale always attains a ±7 code and the channel's dequantized
    absmax is exactly ``7 · max_g s_group``.  Lets the GEMM launcher build the
    double scale from the packed checkpoint's ``s_group`` buffer without an
    extra stored tensor (reference stores s_channel separately,
    qlinear_marlin.py:103-122).

    ``s_group``: (G, N) full group scales (any float dtype).  Returns (N,) f32.
    """
    s = jnp.max(s_group.astype(jnp.float32), axis=0)
    s = jnp.where(s == 0, 1.0, s)
    return s * (7.0 / 127.0)


def requantize_group_weights_int8(
    q4: jax.Array, s_group: jax.Array, group_size: int
) -> jax.Array:
    """The in-kernel INT4 → INT8 requantization, as a jnp reference.

    ``q4``: (K, N) signed int4 codes in [-8, 7]; ``s_group``: (K//g, N) fp32
    double scales.  Returns (K, N) int8 — exactly what the Pallas kernel feeds
    the MXU (reference kernel: csrc/qqq_gemm.cu:166-210's dequant_per_group,
    minus the fp16 detour).
    """
    K, N = q4.shape
    qg = q4.astype(jnp.float32).reshape(K // group_size, group_size, N)
    w8 = jnp.round(qg * s_group[:, None, :])
    return jnp.clip(w8, -127, 127).reshape(K, N).astype(jnp.int8)


def _int_dot(a: jax.Array, b: jax.Array) -> jax.Array:
    return jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def w4a8_matmul_reference(
    a_q: jax.Array,
    s_token: jax.Array,
    q4: jax.Array,
    s_channel: Optional[jax.Array] = None,
    s_group: Optional[jax.Array] = None,
    *,
    group_size: int = -1,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """Bit-accurate jnp reference of the W4A8 GEMM (golden model for Pallas).

    ``a_q``: (M, K) int8 activations; ``s_token``: (M, 1) fp32;
    ``q4``: (K, N) signed int4 codes; ``s_channel``: (N,) fp32 (per-channel
    path); ``s_group``: (K//g, N) fp32 **full** group scales (per-group path).

    Per-channel: ``D = (A·W4)_s32 · s_channel · s_token``
    (csrc/qqq_gemm.cu:680-726).

    Per-group (TPU-first redesign): the reference requantizes INT4 → INT8
    in-kernel through fp16 double scales because CUDA tensor cores need one
    int8 operand for the whole K reduction (qqq_gemm.cu:166-210).  On TPU we
    instead take an exact int32 MXU dot *per 128-group* and accumulate the
    fp32-scaled partial sums: ``D = Σ_g (A_g·W4_g)_s32 · s_group[g] · s_token``
    — no requantization rounding at all, strictly more accurate than the
    reference at the same storage format, and cheaper in-kernel.
    """
    s_token = s_token.astype(jnp.float32)
    if group_size == -1:
        assert s_channel is not None
        acc = _int_dot(a_q, q4)
        out = acc.astype(jnp.float32) * s_channel[None, :].astype(jnp.float32)
        out = out * s_token
        return out.astype(out_dtype)

    assert s_group is not None
    M, K = a_q.shape
    N = q4.shape[1]
    G = K // group_size
    facc = jnp.zeros((M, N), jnp.float32)
    for g in range(G):  # same accumulation order as the Pallas kernel
        sl = slice(g * group_size, (g + 1) * group_size)
        d = _int_dot(a_q[:, sl], q4[sl])
        facc = facc + d.astype(jnp.float32) * s_group[g][None, :].astype(jnp.float32)
    return (facc * s_token).astype(out_dtype)
