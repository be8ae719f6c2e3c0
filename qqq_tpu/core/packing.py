"""TPU-native INT4 packing, designed around Mosaic's byte layout.

The reference packs weights with a Marlin tile permutation for CUDA
``ldmatrix``/``mma`` fragments (QQQ/gptq/qlinear/qlinear_marlin.py:147-176,
240-248).  On TPU the fast unpack primitive is different: an int32 VMEM tile
bitcast to int8 yields, for word-row ``r``, byte rows ``4r+i`` = little-endian
byte ``i`` (verified on v5e).  So we choose the layout to make the *whole*
in-kernel unpack just::

    lo = W & 0x0F0F0F0F          # 3 int32 VPU ops per 8 nibbles total
    hi = (W >> 4) & 0x0F0F0F0F
    lo8, hi8 = bitcast(lo, int8), bitcast(hi, int8)   # free reinterpretation
    u8 = concat([lo8_block, hi8_block] per 128-row block)  # natural k order

— roughly 0.5 VPU ops per weight instead of the ~6 a shift-based nibble
sign-extension needs.  Sign handling is moved out of the unpack entirely:
codes are stored *offset-unsigned* (``u = q + 8 ∈ [0, 15]``) and the kernel
folds the ``-8`` back in via ``dot(a, u) - 8·rowsum(a)``.

Layout definition (``PACK_BLOCK = 128`` k-rows per block, = one g=128 group):

* packed array: int32, shape ``(K // 8, N)``; block ``b`` owns word rows
  ``[16b, 16b+16)``.
* word row ``16b + r``, little-endian byte ``i``: low nibble = code
  ``k = 128b + 4r + i``, high nibble = code ``k = 128b + 64 + 4r + i``.

Hence after mask+bitcast, ``lo8[64b:64b+64] = codes [128b, 128b+64)`` and
``hi8[64b:64b+64] = codes [128b+64, 128b+128)`` — contiguous, concat-ready.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

PACK_BLOCK = 128  # k-rows per packing block; equals the g=128 group size


def pack_int4(q: jax.Array) -> jax.Array:
    """Pack signed int4 codes ``(K, N) int8`` → ``(K // 8, N) int32``.

    ``q`` must be in [-8, 7]; K must be a multiple of ``PACK_BLOCK``.
    """
    K, N = q.shape
    if K % PACK_BLOCK != 0:
        raise ValueError(f"K={K} must be a multiple of {PACK_BLOCK}")
    # clamp defensively: out-of-range codes (e.g. a future asymmetric path)
    # would otherwise wrap silently in the uint nibble compose
    q = jnp.clip(q, -8, 7)
    u = (q.astype(jnp.int32) + 8).astype(jnp.uint32)  # offset-unsigned [0,15]
    ub = u.reshape(K // PACK_BLOCK, 2, 16, 4, N)  # [block, half, r, i, n]
    byte = ub[:, 0] | (ub[:, 1] << 4)  # [block, r, i, n], values 0..255
    w32 = (
        byte[:, :, 0]
        | (byte[:, :, 1] << 8)
        | (byte[:, :, 2] << 16)
        | (byte[:, :, 3] << 24)
    )
    w32 = w32.reshape(K // 8, N)
    return jax.lax.bitcast_convert_type(w32, jnp.int32)


def unpack_int4(packed: jax.Array) -> jax.Array:
    """Unpack ``(K//8, N) int32`` → signed int4 codes ``(K, N) int8``.

    Pure-jnp inverse of :func:`pack_int4`; the golden model for the kernel's
    mask+bitcast unpack.
    """
    K8, N = packed.shape
    K = K8 * 8
    w = jax.lax.bitcast_convert_type(packed, jnp.uint32)
    wb = w.reshape(K // PACK_BLOCK, 16, N)  # [block, r, n]
    bytes_ = jnp.stack(
        [(wb >> (8 * i)) & 0xFF for i in range(4)], axis=2
    )  # [block, r, i, n]
    lo = (bytes_ & 0xF).reshape(K // PACK_BLOCK, 64, N)
    hi = (bytes_ >> 4).reshape(K // PACK_BLOCK, 64, N)
    u = jnp.concatenate([lo, hi], axis=1)  # [block, 128, n] in k order
    return (u.astype(jnp.int32) - 8).reshape(K, N).astype(jnp.int8)
