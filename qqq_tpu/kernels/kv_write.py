"""In-place KV-cache write kernels (the TPU `reshape_and_cache`).

The paged pool's XLA scatter (``pool.at[phys, :, off].set``) is the decode
tick's hidden cost: per token it updates ``n_kv`` strided 128-byte slivers
across four pool buffers, and measured engine-shaped profiles put the paged
per-layer decode slope at ~2.2× the fixed-slot engine's
(scripts/profile_engine_tick.py, bs=16: 1252 vs 557 µs/layer/step) — the
write, not the paged attention kernel, dominates the paged-vs-slot gap
(VERDICT r3 #2).

Here the write is ONE Pallas grid cell per request: the cell streams the
request's CURRENT (n_kv, bs, hd) pool block (table-driven index map, same
addressing trick as kernels/attention.py's paged kernels), quantizes the
new token's (n_kv, hd) row, lane/sublane-selects it into the block, and
writes the block back — with ``input_output_aliases`` pinning the pool
buffers in place, so untouched blocks are never copied.  Traffic is
B·(2·block + scales) ≈ 2 MB/request instead of a pool-sized copy or a
thousand scattered slivers.

vLLM's CUDA analogue is `reshape_and_cache` (csrc/cache_kernels.cu in
vLLM); the reference itself has no KV machinery (it serves through vLLM,
reference README.md:15).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _slot_write_kernel(
    clen_ref,   # (B,) int32 scalar-prefetch — position being written
    kq_ref,     # (1, nkv, 1, hd) int8
    ks_ref,     # (1, nkv, 1) f32
    vq_ref, vs_ref,
    kin_ref,    # (1, nkv, sblk, hd) int8 — S-tile holding the position
    ksin_ref, vin_ref, vsin_ref,
    kout_ref, ksout_ref, vout_ref, vsout_ref,
    *,
    sblk: int,
    S: int,
):
    b = pl.program_id(0)
    # clamp like the dynamic_update_slice this replaces: an at-capacity
    # row (clen >= S) writes position S-1, not (last tile) + clen % sblk
    pos = jnp.minimum(clen_ref[b], S - 1)
    off = pos % sblk
    sub = jax.lax.broadcasted_iota(jnp.int32, (1, sblk, 1), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, sblk), 1)
    kout_ref[0] = jnp.where(sub == off, kq_ref[0], kin_ref[0])
    vout_ref[0] = jnp.where(sub == off, vq_ref[0], vin_ref[0])
    ksout_ref[0] = jnp.where(lane == off, ks_ref[0], ksin_ref[0])
    vsout_ref[0] = jnp.where(lane == off, vs_ref[0], vsin_ref[0])


def _quant_rows(x):
    """(B, T, nkv, hd) fp → ((B, nkv, T, hd) int8, (B, nkv, T) f32):
    serve/kv_cache._quant (the single source of the KV quant numerics) on
    the head-major layout."""
    from qqq_tpu.serve.kv_cache import _quant

    return _quant(jnp.swapaxes(x, 1, 2))


_SLOT_WRITE_SBLK = 128  # S-tile streamed per request (divides every engine
                        # max_len; 2 MB in+out per request at nkv=32,hd=128)


def slot_decode_write_int8(
    k_cache: jax.Array,   # (B, nkv, S, hd) int8
    k_scale: jax.Array,   # (B, nkv, S) f32
    v_cache: jax.Array,
    v_scale: jax.Array,
    k_new: jax.Array,     # (B, 1, nkv, hd) fp
    v_new: jax.Array,
    cache_len: jax.Array,  # (B,) int32 — position being written
    *,
    interpret: Optional[bool] = None,
):
    """Fixed-slot analogue of :func:`paged_decode_write_int8`: per request,
    stream the ``_SLOT_WRITE_SBLK``-token S-tile containing ``cache_len``,
    select the quantized token in, write it back in place."""
    B, nkv, S, hd = k_cache.shape
    sblk = _SLOT_WRITE_SBLK
    assert S % sblk == 0, (S, sblk)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    kq, ks = _quant_rows(k_new)
    vq, vs = _quant_rows(v_new)

    def tile_idx(b, c):
        return (b, 0, jnp.minimum(c[b] // sblk, S // sblk - 1), 0)

    def tile_idx3(b, c):
        return (b, 0, jnp.minimum(c[b] // sblk, S // sblk - 1))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, nkv, 1, hd), lambda b, c: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nkv, 1), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nkv, 1, hd), lambda b, c: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nkv, 1), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nkv, sblk, hd), tile_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nkv, sblk), tile_idx3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nkv, sblk, hd), tile_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nkv, sblk), tile_idx3,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, nkv, sblk, hd), tile_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nkv, sblk), tile_idx3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nkv, sblk, hd), tile_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nkv, sblk), tile_idx3,
                         memory_space=pltpu.VMEM),
        ],
    )

    kp, ksp, vp, vsp = pl.pallas_call(
        functools.partial(_slot_write_kernel, sblk=sblk, S=S),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(k_scale.shape, k_scale.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
            jax.ShapeDtypeStruct(v_scale.shape, v_scale.dtype),
        ],
        # flat inputs: 0=clen 1=kq 2=ks 3=vq 4=vs 5..8=pools
        input_output_aliases={5: 0, 6: 1, 7: 2, 8: 3},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        cache_len.astype(jnp.int32), kq, ks, vq, vs,
        k_cache, k_scale, v_cache, v_scale,
    )
    return kp, ksp, vp, vsp


def _write_kernel(
    tab_ref,    # (B, nbmax) int32 scalar-prefetch
    clen_ref,   # (B,) int32 scalar-prefetch — position being written
    kq_ref,     # (1, nkv, 1, hd) int8 — quantized new k row
    ks_ref,     # (1, nkv, 1) f32 — its scale
    vq_ref,     # (1, nkv, 1, hd) int8
    vs_ref,     # (1, nkv, 1) f32
    kin_ref,    # (1, nkv, bs, hd) int8 — current pool block (aliased)
    ksin_ref,   # (1, nkv, bs) f32
    vin_ref,    # (1, nkv, bs, hd) int8
    vsin_ref,   # (1, nkv, bs) f32
    kout_ref, ksout_ref, vout_ref, vsout_ref,
    *,
    bs: int,
):
    b = pl.program_id(0)
    off = clen_ref[b] % bs
    sub = jax.lax.broadcasted_iota(jnp.int32, (1, bs, 1), 1)  # sublane pos
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, bs), 1)
    kout_ref[0] = jnp.where(sub == off, kq_ref[0], kin_ref[0])
    vout_ref[0] = jnp.where(sub == off, vq_ref[0], vin_ref[0])
    ksout_ref[0] = jnp.where(lane == off, ks_ref[0], ksin_ref[0])
    vsout_ref[0] = jnp.where(lane == off, vs_ref[0], vsin_ref[0])


def _chunk_write_kernel(
    tab_ref,    # (B, nbmax) int32 scalar-prefetch
    clen_ref,   # (B,) int32 scalar-prefetch — first position of the chunk
    kq_ref,     # (1, nkv, bs, hd) int8 — j-th bs-slice of the SHIFTED chunk
    ks_ref,     # (1, nkv, bs) f32
    vq_ref, vs_ref,
    kin_ref,    # (1, nkv, bs, hd) int8 — pool block vb0 + j (aliased)
    ksin_ref, vin_ref, vsin_ref,
    kout_ref, ksout_ref, vout_ref, vsout_ref,
    *,
    bs: int,
    T: int,
):
    """Cell (b, j): place the chunk tokens landing in the row's
    (clen//bs + j)-th virtual block.  The host wrapper pre-shifts each
    row's tokens so token t sits at padded row (clen % bs) + t — the
    source block delivered by the index map (static j·bs slice) is then
    already sublane-aligned with the destination block, and Mosaic sees
    no dynamic slice (dynamic sublane starts must be provably 8-aligned,
    which a chunk offset is not)."""
    b = pl.program_id(0)
    j = pl.program_id(1)
    off = clen_ref[b] % bs
    p = jax.lax.broadcasted_iota(jnp.int32, (1, bs, 1), 1)
    t = j * bs + p - off  # chunk-token index at block sublane p
    valid = (t >= 0) & (t < T)
    kout_ref[0] = jnp.where(valid, kq_ref[0], kin_ref[0])
    vout_ref[0] = jnp.where(valid, vq_ref[0], vin_ref[0])
    lane_t = j * bs + jax.lax.broadcasted_iota(jnp.int32, (1, bs), 1) - off
    lvalid = (lane_t >= 0) & (lane_t < T)
    ksout_ref[0] = jnp.where(lvalid, ks_ref[0], ksin_ref[0])
    vsout_ref[0] = jnp.where(lvalid, vs_ref[0], vsin_ref[0])


def paged_chunk_write_int8(
    k_pool: jax.Array,   # (nb, nkv, bs, hd) int8
    k_scale: jax.Array,  # (nb, nkv, bs) f32
    v_pool: jax.Array,
    v_scale: jax.Array,
    k_new: jax.Array,    # (B, T, nkv, hd) fp — chunk tokens
    v_new: jax.Array,
    tables: jax.Array,   # (B, nbmax) int32
    cache_len: jax.Array,  # (B,) int32 — position of the chunk's token 0
    *,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Chunk-prefill analogue of :func:`paged_decode_write_int8`: one grid
    cell per (request, touched pool block) — T//bs + 1 blocks per row
    cover any chunk offset.  Dead cells come in two flavors: a virtual
    block past the chunk's last token gets an ALL-FALSE sublane mask and
    rewrites the null block unchanged, while a cell whose virtual block
    overflows the table (vb >= nbmax) keeps its live mask and writes its
    overflow tokens INTO the null block — intentional: null-block content
    is unspecified by the module contract, so both rewrites are
    harmless."""
    nb, nkv, bs, hd = k_pool.shape
    B, T = k_new.shape[0], k_new.shape[1]
    nbmax = tables.shape[1]
    NB = -(-T // bs) + 1  # ceil(T/bs) blocks + 1 for any straddle offset
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    if B > _PAGED_WRITE_MAX_ROWS:
        # same ≤8-row chunking as paged_decode_write_int8 (the backend
        # fault bisected there keys on the size of grid dim 0); engine
        # dispatches are already grouped ≤ prefill_batch = 8, so this only
        # triggers for callers that raise prefill_batch
        pools = (k_pool, k_scale, v_pool, v_scale)
        for lo in range(0, B, _PAGED_WRITE_MAX_ROWS):
            hi = min(lo + _PAGED_WRITE_MAX_ROWS, B)
            pools = paged_chunk_write_int8(
                *pools, k_new[lo:hi], v_new[lo:hi], tables[lo:hi],
                cache_len[lo:hi], interpret=interpret,
            )
        return pools

    off = (cache_len.astype(jnp.int32) % bs)  # (B,) block-sublane offset
    Tp = NB * bs
    rows = jnp.arange(Tp, dtype=jnp.int32)
    # padded row p holds chunk token p - off[b]; the gather is chunk-sized
    # (cheap vs the pool writes) and runs in XLA, where arbitrary dynamic
    # row addressing is free — the Pallas kernel then only sees statically
    # aligned j*bs source blocks via its index map
    src_t = jnp.clip(rows[None, :] - off[:, None], 0, T - 1)  # (B, Tp)

    def prep(x):
        q, s = _quant_rows(x)  # (B, nkv, T, hd), (B, nkv, T)
        q = jnp.take_along_axis(q, src_t[:, None, :, None], axis=2)
        s = jnp.take_along_axis(s, src_t[:, None, :], axis=2)
        return q, s

    kq, ks = prep(k_new)
    vq, vs = prep(v_new)

    def phys_of(b, j, tab, c):
        # dead cells (virtual block past the chunk's last, or past the
        # table) go to the NULL block: a dead cell's all-false mask makes
        # it rewrite its input block, and if it aliased a LIVE block it
        # would clobber that block's just-written update with stale
        # content (two cells of one row may otherwise clamp to the same
        # entry).  Live cells always hold distinct real blocks.
        vb = c[b] // bs + j
        dead = (vb * bs >= c[b] + T) | (vb >= tab.shape[1])
        return jnp.where(
            dead, 0, tab[b, jnp.minimum(vb, tab.shape[1] - 1)]
        )

    def blk_idx(b, j, tab, c):
        return (phys_of(b, j, tab, c), 0, 0, 0)

    def blk_idx3(b, j, tab, c):
        return (phys_of(b, j, tab, c), 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, NB),
        in_specs=[
            pl.BlockSpec((1, nkv, bs, hd), lambda b, j, tab, c: (b, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nkv, bs), lambda b, j, tab, c: (b, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nkv, bs, hd), lambda b, j, tab, c: (b, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nkv, bs), lambda b, j, tab, c: (b, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nkv, bs, hd), blk_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nkv, bs), blk_idx3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nkv, bs, hd), blk_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nkv, bs), blk_idx3, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, nkv, bs, hd), blk_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nkv, bs), blk_idx3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nkv, bs, hd), blk_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nkv, bs), blk_idx3, memory_space=pltpu.VMEM),
        ],
    )

    kp, ksp, vp, vsp = pl.pallas_call(
        functools.partial(_chunk_write_kernel, bs=bs, T=T),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k_pool.shape, k_pool.dtype),
            jax.ShapeDtypeStruct(k_scale.shape, k_scale.dtype),
            jax.ShapeDtypeStruct(v_pool.shape, v_pool.dtype),
            jax.ShapeDtypeStruct(v_scale.shape, v_scale.dtype),
        ],
        # flat inputs: 0=tables 1=clen 2=kq 3=ks 4=vq 5=vs 6..9=pools
        input_output_aliases={6: 0, 7: 1, 8: 2, 9: 3},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        tables.astype(jnp.int32), cache_len.astype(jnp.int32),
        kq, ks, vq, vs, k_pool, k_scale, v_pool, v_scale,
    )
    return kp, ksp, vp, vsp


# Max grid rows per pallas_call: a REAL device fault, not a tuning knob.
# On the v5e runtime (jax 0.9.0 Mosaic), this kernel's grid with
# data-dependent OUTPUT block index maps (phys_of from scalar-prefetch
# tables) executes correctly up to grid=(8,) and raises `INTERNAL: TPU
# backend error` at grid=(9,)+ (bisected in scripts/repro_paged_write_
# fault3.py; the slot kernel, whose dim-0 output map is the monotone grid
# index itself, runs fine at grid=(16,)).  Larger batches are chunked into
# ≤8-row calls chained through the aliased pools.
_PAGED_WRITE_MAX_ROWS = 8


# NB: no donate_argnums — donation would invalidate a caller's pool arrays
# in eager (test) use; inside the engine's jitted programs the pallas-level
# input_output_aliases + XLA liveness give the in-place update.  On real
# TPUs call this under jit: the eager path (which must copy the aliased
# pool buffers) trips the same backend fault class at any B.
def paged_decode_write_int8(
    k_pool: jax.Array,   # (nb, nkv, bs, hd) int8
    k_scale: jax.Array,  # (nb, nkv, bs) f32
    v_pool: jax.Array,
    v_scale: jax.Array,
    k_new: jax.Array,    # (B, 1, nkv, hd) fp — ONE new token per request
    v_new: jax.Array,
    tables: jax.Array,   # (B, nbmax) int32
    cache_len: jax.Array,  # (B,) int32 — position being written
    *,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """One decode token per request, placed in-place into the paged pool.

    Same quantization as serve/kv_cache._quant (per-(request, head)
    symmetric INT8 over hd).  Masked/overflow rows must point at the null
    block via their table (the serve/paged_kv.py contract) — their write
    lands there harmlessly.  Returns the four pool buffers (aliased:
    untouched blocks are the same memory, never copied).
    """
    nb, nkv, bs, hd = k_pool.shape
    B = k_new.shape[0]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # (B, 1, nkv, hd) → (B, nkv, 1, hd); quantize in XLA (fused elementwise)
    kq, ks = _quant_rows(k_new)
    vq, vs = _quant_rows(v_new)

    if B > _PAGED_WRITE_MAX_ROWS:
        # chunk the batch: each ≤8-row call aliases the pools of the
        # previous one, so the chain is still fully in place (extra cost is
        # one kernel dispatch per 8 rows, ~µs against a decode tick)
        pools = (k_pool, k_scale, v_pool, v_scale)
        for lo in range(0, B, _PAGED_WRITE_MAX_ROWS):
            hi = min(lo + _PAGED_WRITE_MAX_ROWS, B)
            pools = _paged_decode_write_call(
                *pools, kq[lo:hi], ks[lo:hi], vq[lo:hi], vs[lo:hi],
                tables[lo:hi], cache_len[lo:hi], interpret=interpret,
            )
        return pools
    return _paged_decode_write_call(
        k_pool, k_scale, v_pool, v_scale, kq, ks, vq, vs,
        tables, cache_len, interpret=interpret,
    )


def _paged_decode_write_call(
    k_pool, k_scale, v_pool, v_scale,
    kq, ks, vq, vs,      # pre-quantized rows: (B, nkv, 1, hd) int8 / scales
    tables, cache_len,
    *,
    interpret: bool,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    nb, nkv, bs, hd = k_pool.shape
    B = kq.shape[0]

    def phys_of(b, tab, c):
        # the block holding position clen[b]; out-of-capacity positions
        # route to the NULL block like the scatter path (paged_kv.write's
        # "never into the clamped last live block" contract) — clamping
        # into the table would clobber the row's last live block
        vb = c[b] // bs
        return jnp.where(
            vb >= tab.shape[1], 0,
            tab[b, jnp.minimum(vb, tab.shape[1] - 1)],
        )

    def blk_idx(b, tab, c):
        return (phys_of(b, tab, c), 0, 0, 0)

    def blk_idx3(b, tab, c):
        return (phys_of(b, tab, c), 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, nkv, 1, hd), lambda b, tab, c: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nkv, 1), lambda b, tab, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nkv, 1, hd), lambda b, tab, c: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nkv, 1), lambda b, tab, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nkv, bs, hd), blk_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nkv, bs), blk_idx3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nkv, bs, hd), blk_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nkv, bs), blk_idx3, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, nkv, bs, hd), blk_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nkv, bs), blk_idx3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nkv, bs, hd), blk_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nkv, bs), blk_idx3, memory_space=pltpu.VMEM),
        ],
    )

    kp, ksp, vp, vsp = pl.pallas_call(
        functools.partial(_write_kernel, bs=bs),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k_pool.shape, k_pool.dtype),
            jax.ShapeDtypeStruct(k_scale.shape, k_scale.dtype),
            jax.ShapeDtypeStruct(v_pool.shape, v_pool.dtype),
            jax.ShapeDtypeStruct(v_scale.shape, v_scale.dtype),
        ],
        # flat input indices (incl. the 2 scalar-prefetch args): 0=tables
        # 1=clen 2=kq 3=ks 4=vq 5=vs 6=k_pool 7=k_scale 8=v_pool 9=v_scale
        input_output_aliases={6: 0, 7: 1, 8: 2, 9: 3},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        tables.astype(jnp.int32), cache_len.astype(jnp.int32),
        kq, ks, vq, vs, k_pool, k_scale, v_pool, v_scale,
    )
    return kp, ksp, vp, vsp
