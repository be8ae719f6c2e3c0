"""Paged KV cache (block pool + block tables) and the paged flash kernel:
write/read round-trips vs the slot cache, and the table-driven kernel vs the
contiguous-cache kernel on the same logical contents."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qqq_tpu.serve import kv_cache, paged_kv
from qqq_tpu.serve.paged_kv import BlockAllocator
from qqq_tpu.kernels.attention import (
    flash_attention_int8,
    flash_decode_attention_int8,
    paged_flash_attention_int8,
    paged_decode_attention_int8,
    decode_attention_int8,
)


class _Cfg:
    num_key_value_heads = 2
    head_dim = 64
    num_hidden_layers = 1


def _rand_tables(rng, B, nbmax, alloc):
    """Distinct shuffled physical blocks per row — the pool layout a real
    allocator produces (non-contiguous, interleaved across rows)."""
    t = np.zeros((B, nbmax), np.int32)
    for b in range(B):
        blocks = alloc.alloc(nbmax)
        rng.shuffle(blocks)
        t[b] = blocks
    return jnp.asarray(t)


def test_write_read_roundtrip_matches_slot_cache(rng):
    """Writing the same (k, v, offsets) stream into the slot cache and the
    paged pool must produce identical dequantized contents — same
    quantization, different placement."""
    B, T, bs, nbmax = 3, 10, 8, 4
    cfg = _Cfg()
    nkv, hd = cfg.num_key_value_heads, cfg.head_dim
    slot = kv_cache.init(cfg, B, max_len=bs * nbmax, quantized=True,
                         dtype=jnp.float32)[0]
    pool = paged_kv.init(cfg, num_blocks=1 + B * nbmax, block_size=bs,
                         quantized=True)[0]
    alloc = BlockAllocator(1 + B * nbmax)
    tables = _rand_tables(rng, B, nbmax, alloc)

    offsets = jnp.asarray([0, 5, 12], jnp.int32)  # ends stay within S=32
    for _ in range(2):  # two writes: second appends mid-sequence
        k = jnp.asarray(rng.normal(size=(B, T, nkv, hd)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(B, T, nkv, hd)).astype(np.float32))
        slot = kv_cache.write(slot, k, v, offsets)
        pool = paged_kv.write(pool, k, v, offsets, tables)
        offsets = offsets + T

    ks, vs = kv_cache.read(slot, jnp.float32)   # (B, S, nkv, hd)
    kp, vp = paged_kv.read(pool, tables, bs * nbmax, jnp.float32)
    np.testing.assert_array_equal(np.asarray(ks), np.asarray(kp))
    np.testing.assert_array_equal(np.asarray(vs), np.asarray(vp))


def test_write_unquantized_and_null_block_isolation(rng):
    """fp pools round-trip exactly, and a row whose table is all null blocks
    (masked slot) never corrupts other rows' data."""
    B, T, bs, nbmax = 2, 6, 4, 3
    cfg = _Cfg()
    nkv, hd = cfg.num_key_value_heads, cfg.head_dim
    pool = paged_kv.init(cfg, num_blocks=1 + 2 * nbmax, block_size=bs,
                         quantized=False, dtype=jnp.float32)[0]
    alloc = BlockAllocator(1 + 2 * nbmax)
    tables = np.zeros((B, nbmax), np.int32)
    tables[0] = alloc.alloc(nbmax)  # row 1 stays on the null block
    tables = jnp.asarray(tables)

    k = jnp.asarray(rng.normal(size=(B, T, nkv, hd)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, T, nkv, hd)).astype(np.float32))
    pool = paged_kv.write(pool, k, v, jnp.zeros((B,), jnp.int32), tables)
    kr, _ = paged_kv.read(pool, tables, bs * nbmax, jnp.float32)
    np.testing.assert_array_equal(np.asarray(kr[0, :T]), np.asarray(k[0]))
    # row 0's live blocks contain row 0's data only — row 1's writes all
    # landed in block 0, which row 0's table never references
    assert not np.array_equal(np.asarray(kr[0, :T]), np.asarray(k[1]))


def test_allocator_invariants():
    a = BlockAllocator(8)
    assert a.available == 7  # null block reserved
    blocks = a.alloc(7)
    assert 0 not in blocks and sorted(blocks) == list(range(1, 8))
    with pytest.raises(RuntimeError):
        a.alloc(1)
    a.free(blocks[:3])
    assert a.available == 3
    with pytest.raises(ValueError):
        a.free([0])


@pytest.mark.parametrize("B,nh,nkv,bs,nbmax,T,causal", [
    (2, 8, 4, 128, 4, 1, False),    # decode shape
    (2, 8, 4, 128, 4, 16, True),    # chunked prefill, GQA
    (1, 4, 4, 64, 6, 8, True),      # MHA, small blocks
])
def test_paged_flash_matches_contiguous(rng, B, nh, nkv, bs, nbmax, T,
                                        causal):
    """The paged kernel over a shuffled pool == the contiguous flash kernel
    over the same logical cache (bit-identical: same body, same tile walk —
    only the DMA addressing differs)."""
    hd = 64
    S = bs * nbmax
    k8 = rng.integers(-127, 128, size=(B, nkv, S, hd)).astype(np.int8)
    v8 = rng.integers(-127, 128, size=(B, nkv, S, hd)).astype(np.int8)
    ks = rng.uniform(0.005, 0.02, size=(B, nkv, S)).astype(np.float32)
    vs = rng.uniform(0.005, 0.02, size=(B, nkv, S)).astype(np.float32)
    q = rng.normal(size=(B, nh, T, hd)).astype(np.float32)
    clen = rng.integers(T, S - bs - T, size=(B,)).astype(np.int32)

    want = flash_attention_int8(
        jnp.asarray(q), jnp.asarray(k8), jnp.asarray(ks),
        jnp.asarray(v8), jnp.asarray(vs), jnp.asarray(clen),
        causal=causal, sblk=bs,
    )

    # scatter the contiguous cache into a shuffled pool
    alloc = BlockAllocator(1 + B * nbmax)
    rngs = np.random.default_rng(0)
    tables = np.zeros((B, nbmax), np.int32)
    nb_pool = 1 + B * nbmax
    kp = np.zeros((nb_pool, nkv, bs, hd), np.int8)
    vp = np.zeros((nb_pool, nkv, bs, hd), np.int8)
    ksp = np.zeros((nb_pool, nkv, bs), np.float32)
    vsp = np.zeros((nb_pool, nkv, bs), np.float32)
    for b in range(B):
        blocks = alloc.alloc(nbmax)
        rngs.shuffle(blocks)
        tables[b] = blocks
        for s, blk in enumerate(blocks):
            kp[blk] = k8[b, :, s * bs:(s + 1) * bs]
            vp[blk] = v8[b, :, s * bs:(s + 1) * bs]
            ksp[blk] = ks[b, :, s * bs:(s + 1) * bs]
            vsp[blk] = vs[b, :, s * bs:(s + 1) * bs]

    got = paged_flash_attention_int8(
        jnp.asarray(q), jnp.asarray(kp), jnp.asarray(ksp),
        jnp.asarray(vp), jnp.asarray(vsp), jnp.asarray(tables),
        jnp.asarray(clen), causal=causal,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_paged_decode_matches_whole_cache_kernel(rng):
    """End-to-end decode convention check: paged decode (cache_len INCLUDES
    the current token) vs the whole-cache decode kernel on identical
    contents."""
    B, nh, nkv, bs, nbmax, hd = 2, 8, 4, 128, 2, 64
    S = bs * nbmax
    cfg = _Cfg()
    k8 = rng.integers(-127, 128, size=(B, nkv, S, hd)).astype(np.int8)
    v8 = rng.integers(-127, 128, size=(B, nkv, S, hd)).astype(np.int8)
    ks = rng.uniform(0.005, 0.02, size=(B, nkv, S)).astype(np.float32)
    vs = rng.uniform(0.005, 0.02, size=(B, nkv, S)).astype(np.float32)
    q = rng.normal(size=(B, nh, hd)).astype(np.float32)
    clen = np.asarray([37, 190], np.int32)

    # near-exact pin: the paged slab kernel computes the same per-head
    # bf16 dots as the contiguous S-tiled decode at the same tile walk —
    # only f32 accumulation order differs (the cross-head MXU trick runs
    # one (M, hd)·(hd, nkv·bs) dot whose diagonal blocks are the per-head
    # dots), so agreement is ULP-level, not bitwise
    want = flash_decode_attention_int8(
        jnp.asarray(q), jnp.asarray(k8), jnp.asarray(ks),
        jnp.asarray(v8), jnp.asarray(vs), jnp.asarray(clen), sblk=bs,
    )
    # convention pin vs the f32 whole-cache decode kernel (different
    # numerics family: bf16 flash tiles, ≲0.5% relative)
    whole = decode_attention_int8(
        jnp.asarray(q), jnp.asarray(k8), jnp.asarray(ks),
        jnp.asarray(v8), jnp.asarray(vs), jnp.asarray(clen),
    )
    np.testing.assert_allclose(
        np.asarray(want), np.asarray(whole), atol=2e-2
    )

    tables = np.asarray([[2, 1], [3, 4]], np.int32)
    nb_pool = 5
    kp = np.zeros((nb_pool, nkv, bs, hd), np.int8)
    vp = np.zeros((nb_pool, nkv, bs, hd), np.int8)
    ksp = np.zeros((nb_pool, nkv, bs), np.float32)
    vsp = np.zeros((nb_pool, nkv, bs), np.float32)
    for b in range(B):
        for s in range(nbmax):
            blk = tables[b, s]
            kp[blk] = k8[b, :, s * bs:(s + 1) * bs]
            vp[blk] = v8[b, :, s * bs:(s + 1) * bs]
            ksp[blk] = ks[b, :, s * bs:(s + 1) * bs]
            vsp[blk] = vs[b, :, s * bs:(s + 1) * bs]

    got = paged_decode_attention_int8(
        jnp.asarray(q), jnp.asarray(kp), jnp.asarray(ksp),
        jnp.asarray(vp), jnp.asarray(vsp), jnp.asarray(tables),
        jnp.asarray(clen),
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
    )


def test_paged_decode_subtiled_block512(rng):
    """block_size = 512 exercises the slab kernel's in-cell sequence
    sub-tiling (sub=256): results must match the contiguous S-tiled
    decode at the same 256-wide tile walk (ULP-level, see above)."""
    B, nh, nkv, bs, nbmax, hd = 1, 4, 2, 512, 2, 64
    S = bs * nbmax
    k8 = rng.integers(-127, 128, size=(B, nkv, S, hd)).astype(np.int8)
    v8 = rng.integers(-127, 128, size=(B, nkv, S, hd)).astype(np.int8)
    ks = rng.uniform(0.005, 0.02, size=(B, nkv, S)).astype(np.float32)
    vs = rng.uniform(0.005, 0.02, size=(B, nkv, S)).astype(np.float32)
    q = rng.normal(size=(B, nh, hd)).astype(np.float32)
    clen = np.asarray([777], np.int32)  # mid-sub-tile mask boundary

    want = flash_decode_attention_int8(
        jnp.asarray(q), jnp.asarray(k8), jnp.asarray(ks),
        jnp.asarray(v8), jnp.asarray(vs), jnp.asarray(clen), sblk=256,
    )
    tables = np.asarray([[1, 2]], np.int32)
    kp = np.zeros((3, nkv, bs, hd), np.int8)
    vp = np.zeros_like(kp)
    ksp = np.zeros((3, nkv, bs), np.float32)
    vsp = np.zeros_like(ksp)
    for s in range(nbmax):
        kp[tables[0, s]] = k8[0, :, s * bs:(s + 1) * bs]
        vp[tables[0, s]] = v8[0, :, s * bs:(s + 1) * bs]
        ksp[tables[0, s]] = ks[0, :, s * bs:(s + 1) * bs]
        vsp[tables[0, s]] = vs[0, :, s * bs:(s + 1) * bs]
    got = paged_decode_attention_int8(
        jnp.asarray(q), jnp.asarray(kp), jnp.asarray(ksp),
        jnp.asarray(vp), jnp.asarray(vsp), jnp.asarray(tables),
        jnp.asarray(clen),
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
    )


def test_paged_decode_write_kernel_matches_scatter(rng):
    """The in-place Pallas decode write (kernels/kv_write.py) must produce
    exactly the pools the XLA scatter path produces — written position
    quantized identically, every other block byte-identical (aliasing)."""
    import dataclasses

    from qqq_tpu.kernels.kv_write import paged_decode_write_int8

    class Cfg:
        num_key_value_heads = 4
        head_dim = 64
        num_hidden_layers = 1

    B, nkv, hd, bs, nbmax = 3, 4, 64, 32, 4
    pool = paged_kv.init(Cfg, num_blocks=1 + B * nbmax, block_size=bs,
                         quantized=True)[0]
    tables = jnp.asarray(
        np.arange(B * nbmax, dtype=np.int32).reshape(B, nbmax) + 1
    )
    # pre-fill some tokens so blocks hold non-zero history
    k0 = jnp.asarray(rng.normal(size=(B, 40, nkv, hd)).astype(np.float32))
    v0 = jnp.asarray(rng.normal(size=(B, 40, nkv, hd)).astype(np.float32))
    pool = paged_kv.write(pool, k0, v0, jnp.zeros((B,), jnp.int32), tables)

    # one decode token per row at varying offsets (incl. block boundary)
    offsets = jnp.asarray(np.array([40, 31, 63], np.int32))
    k1 = jnp.asarray(rng.normal(size=(B, 1, nkv, hd)).astype(np.float32))
    v1 = jnp.asarray(rng.normal(size=(B, 1, nkv, hd)).astype(np.float32))

    kp, ksp, vp, vsp = paged_decode_write_int8(
        pool["k"], pool["k_scale"], pool["v"], pool["v_scale"],
        k1, v1, tables, offsets,
    )

    # oracle: the module's scatter path (force it by building a T=2 write
    # of [token, garbage-in-null]? simpler: replicate scatter inline)
    pos = offsets[:, None]
    vblock = pos // bs
    phys = jnp.take_along_axis(tables, vblock, axis=1)
    off = (pos % bs).reshape(-1)
    phys_f = phys.reshape(-1)
    from qqq_tpu.serve.kv_cache import _quant
    kq, ks = _quant(jnp.swapaxes(k1, 1, 2))
    vq, vs = _quant(jnp.swapaxes(v1, 1, 2))
    want_k = pool["k"].at[phys_f, :, off].set(
        kq.reshape(B, nkv, hd), mode="drop")
    want_ks = pool["k_scale"].at[phys_f, :, off].set(
        ks.reshape(B, nkv), mode="drop")
    want_v = pool["v"].at[phys_f, :, off].set(
        vq.reshape(B, nkv, hd), mode="drop")
    want_vs = pool["v_scale"].at[phys_f, :, off].set(
        vs.reshape(B, nkv), mode="drop")

    np.testing.assert_array_equal(np.asarray(kp), np.asarray(want_k))
    np.testing.assert_array_equal(np.asarray(vp), np.asarray(want_v))
    np.testing.assert_allclose(np.asarray(ksp), np.asarray(want_ks))
    np.testing.assert_allclose(np.asarray(vsp), np.asarray(want_vs))


def test_paged_write_decode_default_path_matches_scatter(rng):
    """paged_kv.write with T=1 (decode) — the default block-granular XLA
    path — must equal the sliver-scatter semantics exactly."""
    class Cfg:
        num_key_value_heads = 2
        head_dim = 64
        num_hidden_layers = 1

    B, nkv, hd, bs, nbmax = 2, 2, 64, 32, 3
    pool0 = paged_kv.init(Cfg, num_blocks=1 + B * nbmax, block_size=bs,
                          quantized=True)[0]
    tables = jnp.asarray(
        np.arange(B * nbmax, dtype=np.int32).reshape(B, nbmax) + 1
    )
    offsets = jnp.asarray(np.array([5, 33], np.int32))
    k1 = jnp.asarray(rng.normal(size=(B, 1, nkv, hd)).astype(np.float32))
    v1 = jnp.asarray(rng.normal(size=(B, 1, nkv, hd)).astype(np.float32))

    got = paged_kv.write(pool0, k1, v1, offsets, tables)  # kernel path
    # scatter path: pad to T=2 with a second token routed out-of-capacity
    # is awkward — instead call the scatter body via a T=1 fp-style run:
    # rebuild using the same quant + .at scatter as the module's else-branch
    from qqq_tpu.serve.kv_cache import _quant
    kq, ks = _quant(jnp.swapaxes(k1, 1, 2))
    vq, vs = _quant(jnp.swapaxes(v1, 1, 2))
    phys = jnp.take_along_axis(tables, offsets[:, None] // bs, axis=1)
    off = (offsets % bs)
    want_k = pool0["k"].at[phys.reshape(-1), :, off].set(
        kq.reshape(B, nkv, hd), mode="drop")
    np.testing.assert_array_equal(np.asarray(got["k"]),
                                  np.asarray(want_k))


def test_slot_decode_write_kernel_matches_scatter(rng):
    """kv_cache.write's T=1 kernel path must equal the scatter path."""
    import qqq_tpu.serve.kv_cache as kvc
    from qqq_tpu.kernels.kv_write import slot_decode_write_int8

    class Cfg:
        num_key_value_heads = 4
        head_dim = 64
        num_hidden_layers = 1

    B, nkv, hd, S = 3, 4, 64, 256
    cache = kvc.init(Cfg, B, S, quantized=True)[0]
    k0 = jnp.asarray(rng.normal(size=(B, 5, nkv, hd)).astype(np.float32))
    v0 = jnp.asarray(rng.normal(size=(B, 5, nkv, hd)).astype(np.float32))
    cache = kvc.write(cache, k0, v0, jnp.zeros((B,), jnp.int32))

    offsets = jnp.asarray(np.array([5, 127, 128], np.int32))
    k1 = jnp.asarray(rng.normal(size=(B, 1, nkv, hd)).astype(np.float32))
    v1 = jnp.asarray(rng.normal(size=(B, 1, nkv, hd)).astype(np.float32))

    got = kvc.write(cache, k1, v1, offsets)  # kernel path (T=1, S%128==0)

    # oracle: the scatter path, forced by the vmap'd DUS inline
    kq, ks = kvc._quant(jnp.swapaxes(k1, 1, 2))
    vq, vs = kvc._quant(jnp.swapaxes(v1, 1, 2))
    want_k = jax.vmap(
        lambda c, x, off: jax.lax.dynamic_update_slice(c, x, (0, off, 0))
    )(cache["k"], kq, offsets)
    want_ks = jax.vmap(
        lambda c, x, off: jax.lax.dynamic_update_slice(c, x, (0, off))
    )(cache["k_scale"], ks, offsets)
    np.testing.assert_array_equal(np.asarray(got["k"]), np.asarray(want_k))
    np.testing.assert_allclose(np.asarray(got["k_scale"]),
                               np.asarray(want_ks))
    # untouched S-tiles preserved (aliasing): row 0 history at pos 0..4
    np.testing.assert_array_equal(
        np.asarray(got["v"][:, :, :5]), np.asarray(cache["v"][:, :, :5]))


@pytest.mark.parametrize("T,off0", [(64, 0), (64, 13), (96, 31), (5, 60)])
def test_paged_chunk_write_kernel_matches_scatter(rng, T, off0):
    """The chunked (T>1) in-place write must equal the scatter path for
    any chunk offset, including block-straddling and tiny (spec-verify)
    chunks."""
    from qqq_tpu.kernels.kv_write import paged_chunk_write_int8

    class Cfg:
        num_key_value_heads = 2
        head_dim = 64
        num_hidden_layers = 1

    B, nkv, hd, bs, nbmax = 2, 2, 64, 32, 6
    pool = paged_kv.init(Cfg, num_blocks=1 + B * nbmax, block_size=bs,
                         quantized=True)[0]
    tables = jnp.asarray(
        np.arange(B * nbmax, dtype=np.int32).reshape(B, nbmax) + 1
    )
    # history before the chunk
    if off0:
        k0 = jnp.asarray(rng.normal(size=(B, off0, nkv, hd))
                         .astype(np.float32))
        v0 = jnp.asarray(rng.normal(size=(B, off0, nkv, hd))
                         .astype(np.float32))
        pool = dict(zip(
            ("k", "k_scale", "v", "v_scale"),
            __import__("qqq_tpu.kernels.kv_write", fromlist=["x"])
            .paged_chunk_write_int8(
                pool["k"], pool["k_scale"], pool["v"], pool["v_scale"],
                k0, v0, tables, jnp.zeros((B,), jnp.int32))
        ))
    offsets = jnp.full((B,), off0, jnp.int32)
    k1 = jnp.asarray(rng.normal(size=(B, T, nkv, hd)).astype(np.float32))
    v1 = jnp.asarray(rng.normal(size=(B, T, nkv, hd)).astype(np.float32))

    got_k, got_ks, got_v, got_vs = paged_chunk_write_int8(
        pool["k"], pool["k_scale"], pool["v"], pool["v_scale"],
        k1, v1, tables, offsets,
    )

    # oracle: the module's scatter branch
    import os
    os.environ["QQQ_TPU_KV_WRITE_SCATTER"] = "1"
    try:
        want = paged_kv.write(pool, k1, v1, offsets, tables)
    finally:
        del os.environ["QQQ_TPU_KV_WRITE_SCATTER"]
    np.testing.assert_array_equal(np.asarray(got_k), np.asarray(want["k"]))
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want["v"]))
    np.testing.assert_allclose(np.asarray(got_ks),
                               np.asarray(want["k_scale"]))
    np.testing.assert_allclose(np.asarray(got_vs),
                               np.asarray(want["v_scale"]))


@pytest.mark.parametrize("B", [9, 13, 16])
def test_paged_decode_write_chunked_rows_match_scatter(rng, B):
    """B > 8 routes through the ≤8-row chunked kernel chain (the v5e
    runtime faults on this kernel's grid above 8 rows — bisected in
    scripts/repro_paged_write_fault3.py; kernels/kv_write.py
    _PAGED_WRITE_MAX_ROWS).  The chained calls must still equal the
    scatter oracle on every non-null block."""
    from qqq_tpu.kernels.kv_write import paged_decode_write_int8

    class Cfg:
        num_key_value_heads = 4
        head_dim = 64
        num_hidden_layers = 1

    nkv, hd, bs, nbmax = 4, 64, 32, 4
    pool = paged_kv.init(Cfg, num_blocks=1 + B * nbmax, block_size=bs,
                         quantized=True)[0]
    tables = jnp.asarray(
        np.arange(B * nbmax, dtype=np.int32).reshape(B, nbmax) + 1
    )
    offsets = jnp.asarray((np.arange(B, dtype=np.int32) * 37)
                          % (nbmax * bs))
    k1 = jnp.asarray(rng.normal(size=(B, 1, nkv, hd)).astype(np.float32))
    v1 = jnp.asarray(rng.normal(size=(B, 1, nkv, hd)).astype(np.float32))

    got_k, got_ks, got_v, got_vs = paged_decode_write_int8(
        pool["k"], pool["k_scale"], pool["v"], pool["v_scale"],
        k1, v1, tables, offsets,
    )
    import os
    os.environ["QQQ_TPU_KV_WRITE_SCATTER"] = "1"
    try:
        want = paged_kv.write(pool, k1, v1, offsets, tables)
    finally:
        del os.environ["QQQ_TPU_KV_WRITE_SCATTER"]
    np.testing.assert_array_equal(np.asarray(got_k), np.asarray(want["k"]))
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want["v"]))
    np.testing.assert_allclose(np.asarray(got_ks),
                               np.asarray(want["k_scale"]))
    np.testing.assert_allclose(np.asarray(got_vs),
                               np.asarray(want["v_scale"]))


@pytest.mark.parametrize("B", [9, 12])
def test_paged_chunk_write_chunked_rows_match_scatter(rng, B):
    """Chunk-prefill writes with B > 8 rows take the same ≤8-row chain."""
    from qqq_tpu.kernels.kv_write import paged_chunk_write_int8

    class Cfg:
        num_key_value_heads = 2
        head_dim = 64
        num_hidden_layers = 1

    nkv, hd, bs, nbmax, T = 2, 64, 32, 5, 48
    pool = paged_kv.init(Cfg, num_blocks=1 + B * nbmax, block_size=bs,
                         quantized=True)[0]
    tables = jnp.asarray(
        np.arange(B * nbmax, dtype=np.int32).reshape(B, nbmax) + 1
    )
    offsets = jnp.asarray((np.arange(B, dtype=np.int32) * 29)
                          % (nbmax * bs - T))
    k1 = jnp.asarray(rng.normal(size=(B, T, nkv, hd)).astype(np.float32))
    v1 = jnp.asarray(rng.normal(size=(B, T, nkv, hd)).astype(np.float32))

    got_k, got_ks, got_v, got_vs = paged_chunk_write_int8(
        pool["k"], pool["k_scale"], pool["v"], pool["v_scale"],
        k1, v1, tables, offsets,
    )
    import os
    os.environ["QQQ_TPU_KV_WRITE_SCATTER"] = "1"
    try:
        want = paged_kv.write(pool, k1, v1, offsets, tables)
    finally:
        del os.environ["QQQ_TPU_KV_WRITE_SCATTER"]
    np.testing.assert_array_equal(np.asarray(got_k), np.asarray(want["k"]))
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want["v"]))
    np.testing.assert_allclose(np.asarray(got_ks),
                               np.asarray(want["k_scale"]))
    np.testing.assert_allclose(np.asarray(got_vs),
                               np.asarray(want["v_scale"]))


@pytest.mark.parametrize("T", [1, 48])
def test_paged_write_block_granular_matches_scatter_large_b(rng, T):
    """The default block-granular XLA write path at B > 8 (decode and
    chunk) must equal the sliver-scatter oracle on every non-null block,
    including straddling offsets and a table-overflow row (routes to the
    null block, whose content is unspecified)."""
    class Cfg:
        num_key_value_heads = 2
        head_dim = 64
        num_hidden_layers = 1

    B, nkv, hd, bs, nbmax = 13, 2, 64, 32, 5
    pool = paged_kv.init(Cfg, num_blocks=1 + B * nbmax, block_size=bs,
                         quantized=True)[0]
    tables = np.arange(B * nbmax, dtype=np.int32).reshape(B, nbmax) + 1
    tables[-1] = 0  # inactive row: all-null table
    tables = jnp.asarray(tables)
    cap = nbmax * bs
    offsets = jnp.asarray((np.arange(B, dtype=np.int32) * 37)
                          % (cap - T + 1 if T > 1 else cap))
    k1 = jnp.asarray(rng.normal(size=(B, T, nkv, hd)).astype(np.float32))
    v1 = jnp.asarray(rng.normal(size=(B, T, nkv, hd)).astype(np.float32))

    got = paged_kv.write(dict(pool), k1, v1, offsets, tables)
    import os
    os.environ["QQQ_TPU_KV_WRITE_SCATTER"] = "1"
    try:
        want = paged_kv.write(dict(pool), k1, v1, offsets, tables)
    finally:
        del os.environ["QQQ_TPU_KV_WRITE_SCATTER"]
    for key in ("k", "v", "k_scale", "v_scale"):
        a, b = np.asarray(got[key]), np.asarray(want[key])
        np.testing.assert_array_equal(a[1:], b[1:], err_msg=key)
