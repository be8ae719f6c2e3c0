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

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from qqq_tpu.serve.kv_cache import _quant


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
        if os.environ.get("QQQ_TPU_KV_WRITE_PALLAS"):
            # experimental: the in-place Pallas kernels
            # (kernels/kv_write.py).  Correct and fast standalone, but
            # inside the engine's fused decode program (lax.scan over
            # steps × layers, attention kernels in the same program) their
            # data-dependent OUTPUT block index maps trip a v5e runtime
            # fault (`FAILED_PRECONDITION/INTERNAL: TPU backend error`)
            # once a tick composes enough of them — every paged bs=16
            # serving run died this way (r4 q02, r5 q01) while bs ≤ 4
            # survived.  Kept behind this flag for future Mosaic toolchains.
            from qqq_tpu.kernels.kv_write import (
                paged_chunk_write_int8, paged_decode_write_int8,
            )

            if T == 1:
                kp, ksp, vp, vsp = paged_decode_write_int8(
                    cache["k"], cache["k_scale"],
                    cache["v"], cache["v_scale"],
                    k_new, v_new, tables, offsets,
                )
                return {**cache, "k": kp, "k_scale": ksp,
                        "v": vp, "v_scale": vsp}
            # the chunk kernel's source-scale lane blocks are bs wide —
            # Mosaic requires lane blocks 128-divisible (or equal to the
            # array dim), so narrow block sizes fall through to the
            # block-granular path below
            if bs % 128 == 0 or jax.default_backend() != "tpu":
                kp, ksp, vp, vsp = paged_chunk_write_int8(
                    cache["k"], cache["k_scale"],
                    cache["v"], cache["v_scale"],
                    k_new, v_new, tables, offsets,
                )
                return {**cache, "k": kp, "k_scale": ksp,
                        "v": vp, "v_scale": vsp}
        # default: BLOCK-GRANULAR pure-XLA update — gather each touched
        # pool block whole (contiguous dim-0 gather), select the new
        # token(s) in registers, scatter the blocks back (contiguous
        # dim-0 scatter, in-place on the donated pool).  Same traffic
        # class as the Pallas kernels (≈ B·2·block bytes per tick, ~16×
        # less than the strided sliver scatter below) with no Mosaic
        # surface, and no block_size % 128 constraint.
        if T == 1:
            return _write_decode_blocks(cache, k_new, v_new, offsets,
                                        tables)
        return _write_chunk_blocks(cache, k_new, v_new, offsets, tables)

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


def _phys_or_null(tables: jax.Array, vb: jax.Array,
                  dead: jax.Array) -> jax.Array:
    """Physical block for virtual block ``vb`` per row; ``dead`` cells
    (past capacity / past the written span) route to the NULL block — the
    module contract says its content is unspecified, so any write there
    (including same-tick collisions) is harmless."""
    nbmax = tables.shape[1]
    got = jnp.take_along_axis(
        tables, jnp.clip(vb, 0, nbmax - 1), axis=1)
    return jnp.where(dead | (vb >= nbmax), 0, got)


def _write_decode_blocks(cache, k_new, v_new, offsets, tables):
    """T=1 block-granular write: gather each row's current block whole,
    lane-select the quantized token in, scatter the blocks back (dim-0
    only — contiguous DMA per block, in place on a donated pool)."""
    B = k_new.shape[0]
    bs = cache["k"].shape[2]
    kq, ks = _quant(jnp.swapaxes(k_new, 1, 2))  # (B, nkv, 1, hd), (B, nkv, 1)
    vq, vs = _quant(jnp.swapaxes(v_new, 1, 2))
    vb = offsets[:, None] // bs                  # (B, 1)
    phys = _phys_or_null(tables, vb, jnp.zeros_like(vb, bool))[:, 0]  # (B,)
    off = offsets % bs
    sel = (jnp.arange(bs, dtype=jnp.int32)[None, :]
           == off[:, None])                      # (B, bs)

    def put(pool, q):
        cur = pool[phys]                         # (B, nkv, bs, hd)
        new = jnp.where(sel[:, None, :, None], q, cur)
        return pool.at[phys].set(new, mode="drop")

    def put_s(pool, s):
        cur = pool[phys]                         # (B, nkv, bs)
        new = jnp.where(sel[:, None, :], s, cur)
        return pool.at[phys].set(new, mode="drop")

    return {**cache,
            "k": put(cache["k"], kq), "v": put(cache["v"], vq),
            "k_scale": put_s(cache["k_scale"], ks),
            "v_scale": put_s(cache["v_scale"], vs)}


def _write_chunk_blocks(cache, k_new, v_new, offsets, tables):
    """T>1 block-granular write (chunked prefill): per row, gather the
    ceil(T/bs)+1 blocks any chunk offset can straddle, place the chunk's
    quantized tokens by position, scatter the blocks back (dim-0 only)."""
    B, T = k_new.shape[0], k_new.shape[1]
    bs = cache["k"].shape[2]
    NB = -(-T // bs) + 1
    kq, ks = _quant(jnp.swapaxes(k_new, 1, 2))  # (B, nkv, T, hd), (B, nkv, T)
    vq, vs = _quant(jnp.swapaxes(v_new, 1, 2))

    j = jnp.arange(NB, dtype=jnp.int32)[None, :]          # (1, NB)
    vb = offsets[:, None] // bs + j                       # (B, NB)
    dead = vb * bs >= (offsets + T)[:, None]              # past the chunk
    phys = _phys_or_null(tables, vb, dead)                # (B, NB)
    phys_f = phys.reshape(-1)

    # cell (b, j, p) holds chunk token t = j·bs + p − offsets[b] % bs
    p = jnp.arange(bs, dtype=jnp.int32)
    t = (j[:, :, None] * bs + p[None, None, :]
         - (offsets % bs)[:, None, None])                 # (B, NB, bs)
    valid = (t >= 0) & (t < T)
    tc = jnp.clip(t, 0, T - 1).reshape(B, 1, NB * bs)     # (B, 1, NB·bs)

    def put(pool, q):                                     # q (B, nkv, T, hd)
        cur = pool[phys_f]                                # (B·NB, nkv, bs, hd)
        val = jnp.take_along_axis(q, tc[..., None], axis=2)
        val = val.reshape(B, -1, NB, bs, q.shape[-1])     # (B, nkv, NB, bs, hd)
        val = jnp.swapaxes(val, 1, 2).reshape(cur.shape)
        new = jnp.where(valid[:, :, None, :, None]
                        .reshape(B * NB, 1, bs, 1), val, cur)
        return pool.at[phys_f].set(new, mode="drop")

    def put_s(pool, s):                                   # s (B, nkv, T)
        cur = pool[phys_f]                                # (B·NB, nkv, bs)
        val = jnp.take_along_axis(s, tc, axis=2)
        val = val.reshape(B, -1, NB, bs)
        val = jnp.swapaxes(val, 1, 2).reshape(cur.shape)
        new = jnp.where(valid[:, :, None, :]
                        .reshape(B * NB, 1, bs), val, cur)
        return pool.at[phys_f].set(new, mode="drop")

    return {**cache,
            "k": put(cache["k"], kq), "v": put(cache["v"], vq),
            "k_scale": put_s(cache["k_scale"], ks),
            "v_scale": put_s(cache["v_scale"], vs)}


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
