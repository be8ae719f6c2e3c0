"""TPU-native INT4 nibble packing.

The reference packs weights with a Marlin tile permutation designed for CUDA
``ldmatrix``/``mma`` fragment layouts (QQQ/gptq/qlinear/qlinear_marlin.py:
147-176, 240-248).  None of that applies to TPU.  Here we choose the layout
for TPU (sublane × lane) tiling and cheap in-kernel unpacking:

* Signed int4 codes (``[-8, 7]``, per-channel ``[-7, 7]``) are packed two per
  int8 byte, shape ``(K // 2, N)`` — lane dimension N untouched, so a packed
  block is a normal int8 VMEM tile.
* Packing is *plane-wise within each 128-row k-block* (``PACK_BLOCK = 128``):
  packed row ``b*64 + r`` holds code ``k = b*128 + r`` in the low nibble and
  code ``k = b*128 + 64 + r`` in the high nibble.

Why: a kernel k-tile that is a multiple of 128 maps to a *contiguous* range of
packed rows, unpacking is two shifts + one concatenate per block (no
interleave/ reshape across sublanes), and a 128-row block is exactly one g=128
quantization group, so group scales broadcast over whole unpacked blocks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

PACK_BLOCK = 128  # k-rows per packing block; equals the g=128 group size
_HALF = PACK_BLOCK // 2


def pack_int4(q: jax.Array) -> jax.Array:
    """Pack signed int4 codes ``(K, N) int8`` → ``(K//2, N) int8``.

    K must be a multiple of ``PACK_BLOCK`` (model dims are multiples of 256).
    """
    K, N = q.shape
    if K % PACK_BLOCK != 0:
        raise ValueError(f"K={K} must be a multiple of {PACK_BLOCK}")
    qb = q.reshape(K // PACK_BLOCK, 2, _HALF, N)  # [block, half, row, n]
    lo = qb[:, 0].astype(jnp.int32) & 0xF
    hi = qb[:, 1].astype(jnp.int32) & 0xF
    packed = (lo | (hi << 4)).astype(jnp.uint8).astype(jnp.int8)
    return packed.reshape(K // 2, N)


def unpack_int4_block(p32: jax.Array) -> jax.Array:
    """Unpack one packed block ``(rows, N) int32`` → ``(2*rows, N) int32``.

    ``p32`` is the zero-extended byte value (0..255).  Sign-extension of each
    nibble is done with shifts — this is the exact sequence the Pallas kernel
    uses in-register (cheap VPU ops; replaces csrc/qqq_gemm.cu:146-210's
    lop3/prmt nibble tricks).
    """
    lo = jax.lax.shift_right_arithmetic(jax.lax.shift_left(p32, 28), 28)
    hi = jax.lax.shift_right_arithmetic(jax.lax.shift_left(p32, 24), 28)
    return jnp.concatenate([lo, hi], axis=0)


def unpack_int4(packed: jax.Array) -> jax.Array:
    """Unpack ``(K//2, N) int8`` → signed int4 codes ``(K, N) int8``.

    Inverse of :func:`pack_int4`; jnp reference for kernel golden tests.
    """
    K2, N = packed.shape
    K = K2 * 2
    p32 = packed.astype(jnp.int32) & 0xFF
    pb = p32.reshape(K // PACK_BLOCK, _HALF, N)
    blocks = [unpack_int4_block(pb[b]) for b in range(K // PACK_BLOCK)]
    return jnp.concatenate(blocks, axis=0).astype(jnp.int8)
