"""Paged KV cache: block-pool layout with per-request block tables.

The fixed-slot cache (serve/kv_cache.py) reserves ``max_batch × max_len``
tokens of KV up front — fine when sequences are uniform, wasteful in
production serving where lengths vary by orders of magnitude.  Here the KV
store is a pool of fixed-size blocks shared by all requests (the vLLM
PagedAttention design, arXiv:2309.06180, re-done for TPU): each request owns
only the blocks its tokens fill, and the attention kernel follows a
per-request **block table** through the pool via Pallas scalar-prefetch
index maps (kernels/attention.py:paged_flash_attention_int8) — the gather
happens in the DMA engine's addressing, not as a materialized copy.

No reference analogue: the reference delegates serving to vLLM
(README.md:15, 77-79); paged INT8 KV is this framework's TPU serving scope
on top of BASELINE.json configs[3].

Layout per layer (block-major so a table entry is one pool index):

    k / v      : (num_blocks, n_kv, block_size, head_dim)  int8 | fp
    k_scale /
    v_scale    : (num_blocks, n_kv, block_size) f32        (quantized only)

Block 0 is the reserved **null block**: unused table entries point at it and
masked rows' writes land in it, so padded scatter/gather destinations are
always in-bounds and never touch live data (the allocator never hands it
out).  Token at sequence position ``p`` of a request lives at
``(table[p // block_size], :, p % block_size)``.
"""

from __future__ import annotations

import warnings
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from qqq_tpu.serve.kv_cache import _quant

_WARNED_SCATTER_FALLBACK = False


def init(
    config, num_blocks: int, block_size: int, *, quantized: bool = True,
    dtype=jnp.bfloat16,
) -> List[Dict[str, Any]]:
    """Per-layer block pools.  ``num_blocks`` INCLUDES the reserved null
    block 0 — usable capacity is ``(num_blocks - 1) * block_size`` tokens."""
    nkv, hd = config.num_key_value_heads, config.head_dim
    store_dtype = jnp.int8 if quantized else dtype
    caches = []
    for _ in range(config.num_hidden_layers):
        c = {
            "k": jnp.zeros((num_blocks, nkv, block_size, hd), store_dtype),
            "v": jnp.zeros((num_blocks, nkv, block_size, hd), store_dtype),
        }
        if quantized:
            c["k_scale"] = jnp.zeros((num_blocks, nkv, block_size),
                                     jnp.float32)
            c["v_scale"] = jnp.zeros((num_blocks, nkv, block_size),
                                     jnp.float32)
        caches.append(c)
    return caches


def write(
    cache: Dict[str, Any],
    k_new: jax.Array,  # (B, T, n_kv, hd)
    v_new: jax.Array,
    offsets: jax.Array,  # (B,) int32 — sequence position of each row's token 0
    tables: jax.Array,   # (B, max_blocks) int32 — pool indices, pad with 0
) -> Dict[str, Any]:
    """Scatter T new tokens per row into their pool blocks.

    Rows whose table entries are the null block (masked/inactive slots) write
    into block 0 — harmless by construction.  Same INT8 quantization as the
    slot cache (per-(b, head, pos) symmetric over head_dim).
    """
    B, T, nkv, hd = k_new.shape
    bs = cache["k"].shape[2]
    quantized = "k_scale" in cache

    import os
    if quantized and not os.environ.get("QQQ_TPU_KV_WRITE_SCATTER"):
        # in-place Pallas placement (kernels/kv_write.py) — the XLA scatter
        # below costs ~0.65 ms/layer at bs=16 decode (strided slivers
        # across 4 pool buffers) and a comparable share of every chunked
        # prefill dispatch; the kernels stream whole blocks and alias the
        # pool in place
        from qqq_tpu.kernels.kv_write import (
            paged_chunk_write_int8, paged_decode_write_int8,
        )

        if T == 1:
            kp, ksp, vp, vsp = paged_decode_write_int8(
                cache["k"], cache["k_scale"], cache["v"], cache["v_scale"],
                k_new, v_new, tables, offsets,
            )
            return {**cache, "k": kp, "k_scale": ksp,
                    "v": vp, "v_scale": vsp}
        # the chunk kernel's source-scale lane blocks are bs wide — Mosaic
        # requires lane blocks 128-divisible (or equal to the array dim),
        # so narrow block sizes take the XLA scatter below on real TPUs
        # (~0.65 ms/layer vs the in-place kernel; warn once so the perf
        # cliff is visible to users picking block_size < 128)
        if bs % 128 != 0 and jax.default_backend() == "tpu":
            global _WARNED_SCATTER_FALLBACK
            if not _WARNED_SCATTER_FALLBACK:
                _WARNED_SCATTER_FALLBACK = True
                warnings.warn(
                    f"paged chunk-prefill write: block_size={bs} is not a "
                    "multiple of 128, falling back to the XLA scatter path "
                    "(~0.65 ms/layer slower than the in-place kernel); use "
                    "block_size=128 for full paged prefill performance",
                    stacklevel=2,
                )
        if bs % 128 == 0 or jax.default_backend() != "tpu":
            kp, ksp, vp, vsp = paged_chunk_write_int8(
                cache["k"], cache["k_scale"], cache["v"], cache["v_scale"],
                k_new, v_new, tables, offsets,
            )
            return {**cache, "k": kp, "k_scale": ksp,
                    "v": vp, "v_scale": vsp}

    pos = offsets[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]  # (B, T)
    vblock = pos // bs
    phys = jnp.take_along_axis(
        tables, jnp.clip(vblock, 0, tables.shape[1] - 1), axis=1
    )  # (B, T) pool index
    # out-of-capacity positions route to the NULL block (the module
    # contract), never into the clamped last live block
    phys = jnp.where(vblock < tables.shape[1], phys, 0)
    off = pos % bs
    phys_f = phys.reshape(-1)
    off_f = off.reshape(-1)

    def scat(pool, val):  # pool (nb, nkv, bs, hd), val (B, T, nkv, hd)
        return pool.at[phys_f, :, off_f].set(
            val.reshape(B * T, nkv, hd), mode="drop"
        )

    def scat_s(pool, val):  # pool (nb, nkv, bs), val (B, T, nkv)
        return pool.at[phys_f, :, off_f].set(
            val.reshape(B * T, nkv), mode="drop"
        )

    out = dict(cache)
    if quantized:
        # _quant is per-(…, pos) over hd on the head-major layout; feed it
        # (B, T, nkv, hd) directly — the reduced axis is hd either way
        kq, ks = _quant(k_new)
        vq, vs = _quant(v_new)
        out["k"] = scat(cache["k"], kq)
        out["v"] = scat(cache["v"], vq)
        out["k_scale"] = scat_s(cache["k_scale"], ks)
        out["v_scale"] = scat_s(cache["v_scale"], vs)
    else:
        out["k"] = scat(cache["k"], k_new.astype(cache["k"].dtype))
        out["v"] = scat(cache["v"], v_new.astype(cache["v"].dtype))
    return out


def read(
    cache: Dict[str, Any], tables: jax.Array, seq_len: int, dtype
) -> Tuple[jax.Array, jax.Array]:
    """Dense (B, S, n_kv, hd) k/v gathered from the pool and dequantized —
    the jnp fallback / test oracle; kernels read the raw pool."""
    bs = cache["k"].shape[2]
    nb = -(-seq_len // bs)  # blocks covering seq_len
    phys = tables[:, :nb]  # (B, nb)

    def gather(pool):  # (nb_pool, nkv, bs, ...) → (B, S, nkv, ...)
        g = pool[phys]  # (B, nb, nkv, bs, ...)
        g = jnp.moveaxis(g, 3, 2)  # (B, nb, bs, nkv, ...)
        return g.reshape((g.shape[0], nb * bs) + g.shape[3:])[:, :seq_len]

    if "k_scale" in cache:
        k = gather(cache["k"]).astype(jnp.float32) \
            * gather(cache["k_scale"])[..., None]
        v = gather(cache["v"]).astype(jnp.float32) \
            * gather(cache["v_scale"])[..., None]
        return k.astype(dtype), v.astype(dtype)
    return gather(cache["k"]).astype(dtype), gather(cache["v"]).astype(dtype)


class BlockAllocator:
    """Host-side free-list over the pool.  Block 0 (the null block) is never
    allocated.  The engine calls this between device steps — allocation is
    pure Python bookkeeping, no device work."""

    def __init__(self, num_blocks: int):
        if num_blocks < 2:
            raise ValueError("need at least 2 blocks (one is the null block)")
        self.num_blocks = num_blocks
        self._free = list(range(num_blocks - 1, 0, -1))

    @property
    def available(self) -> int:
        return len(self._free)

    def alloc(self, n: int) -> List[int]:
        if n > len(self._free):
            raise RuntimeError(
                f"KV pool exhausted: need {n} blocks, {len(self._free)} free"
            )
        taken = [self._free.pop() for _ in range(n)]
        return taken

    def free(self, blocks) -> None:
        for b in blocks:
            b = int(b)
            if b == 0:
                raise ValueError("null block cannot be freed")
            self._free.append(b)
