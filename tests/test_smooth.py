"""Smoothing/migration: invariance of the folded model + search sanity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qqq_tpu.core import QuantSpec, fake_quantize_weight
from qqq_tpu.models import ModelConfig, forward, init_params
from qqq_tpu.calib.smooth import (
    migrate,
    smooth_model,
    export_smoothed_model,
    _sub_block_output,
    _quantized_output,
)
from qqq_tpu.models.llama import rope_inv_freq

W_SPEC = QuantSpec(bits=4, group_size=-1)


def _mha_config(**kw):
    base = dict(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=4,  # MHA → o_proj smoothing active
        max_position_embeddings=64,
    )
    base.update(kw)
    return ModelConfig(**base)


def _extra(config, B, T):
    return {
        "config": config,
        "positions": jnp.broadcast_to(
            jnp.arange(T, dtype=jnp.int32)[None], (B, T)
        ),
        "inv_freq": rope_inv_freq(config),
    }


@pytest.mark.parametrize("method", ["os+", "awq", "sq"])
def test_migrate_reduces_quant_error(rng, method):
    """A migration scale must not increase the quantized output error on an
    outlier-heavy activation (the scenario it exists for)."""
    C, N, B, T = 64, 32, 2, 8
    x = rng.normal(size=(B, T, C)).astype(np.float32)
    x[..., :4] *= 30.0  # channel outliers
    w = rng.normal(size=(C, N)).astype(np.float32)
    extra = {}
    xj, wj = jnp.asarray(x), jnp.asarray(w)
    fp = _sub_block_output("o_proj", xj, wj, extra)

    def err(xq_in, wq_in):
        out = _quantized_output("o_proj", xq_in, wq_in, W_SPEC, extra)
        return float(jnp.mean((out - fp) ** 2))

    base_err = err(xj, wj)
    s = migrate("o_proj", xj, wj, extra, method=method, w_spec=W_SPEC,
                n_grid=40)
    assert s.shape == (C,)
    assert np.all(np.asarray(s) > 0)
    smooth_err = err(xj / s, wj * s[:, None])
    assert smooth_err <= base_err * 1.05, (method, base_err, smooth_err)


def test_smooth_export_function_invariance(rng):
    """Folding scale_list must keep the FP model function unchanged
    (the reference folds into LN + linears, export.py:8-103: exact in fp)."""
    config = _mha_config()
    params = init_params(config, jax.random.PRNGKey(0), dtype=jnp.float32)
    calib = jnp.asarray(rng.integers(0, 128, size=(2, 16)).astype(np.int32))
    scale_list = smooth_model(
        params, config, calib, method="sq", w_spec=W_SPEC
    )
    assert len(scale_list) == 4 * config.num_hidden_layers

    tokens = jnp.asarray(rng.integers(0, 128, size=(2, 10)).astype(np.int32))
    want, _ = forward(params, config, tokens)
    folded = export_smoothed_model(params, config, scale_list)
    got, _ = forward(folded, config, tokens)
    scale = float(jnp.abs(want).max())
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=5e-4 * scale
    )


def test_smooth_gqa_skips_o_proj(rng):
    """GQA models SEARCH the o_proj scale (the reference's mirrors migrate
    unconditionally — smooth/models/qwen2.py:305-327; parity-locked by
    test_reference_parity_e2e_qwen2) but must not FOLD it
    (export.py:27-31): export drops it and the model function is
    preserved."""
    config = _mha_config(num_key_value_heads=2)
    params = init_params(config, jax.random.PRNGKey(1), dtype=jnp.float32)
    calib = jnp.asarray(rng.integers(0, 128, size=(2, 16)).astype(np.int32))
    scale_list = smooth_model(params, config, calib, method="sq")
    assert len(scale_list) == 4 * config.num_hidden_layers

    tokens = jnp.asarray(rng.integers(0, 128, size=(2, 8)).astype(np.int32))
    want, _ = forward(params, config, tokens)
    folded = export_smoothed_model(params, config, scale_list)
    got, _ = forward(folded, config, tokens)
    scale = float(jnp.abs(want).max())
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=5e-4 * scale
    )


def test_smooth_improves_quantized_model(rng):
    """End-to-end: smoothing should reduce the quantized-model output error
    on a model with injected activation outliers."""
    config = _mha_config(num_hidden_layers=1)
    params = init_params(config, jax.random.PRNGKey(2), dtype=jnp.float32)
    # inject outlier-prone channels via the embedding
    emb = np.array(params["embed"])  # writable copy
    emb[:, :3] *= 25.0
    params["embed"] = jnp.asarray(emb)

    calib = jnp.asarray(rng.integers(0, 128, size=(2, 16)).astype(np.int32))
    tokens = jnp.asarray(rng.integers(0, 128, size=(2, 10)).astype(np.int32))
    fp_logits, _ = forward(params, config, tokens)

    def rtn_quantize(p):
        q = dict(p)
        layers = []
        for layer in p["layers"]:
            nl = dict(layer)
            for name in ("q_proj", "k_proj", "v_proj", "o_proj",
                         "gate_proj", "up_proj", "down_proj"):
                nl[name] = {
                    **layer[name],
                    "w": fake_quantize_weight(
                        layer[name]["w"].astype(jnp.float32), W_SPEC
                    ),
                }
            layers.append(nl)
            q["layers"] = layers
        return q

    base_err = float(jnp.mean(
        (forward(rtn_quantize(params), config, tokens)[0] - fp_logits) ** 2
    ))
    scale_list = smooth_model(params, config, calib, method="os+", n_grid=30)
    folded = export_smoothed_model(params, config, scale_list)
    smooth_err = float(jnp.mean(
        (forward(rtn_quantize(folded), config, tokens)[0] - fp_logits) ** 2
    ))
    assert smooth_err <= base_err * 1.1, (base_err, smooth_err)
