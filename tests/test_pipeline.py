"""End-to-end: GPTQ-quantize a tiny model, eval through the packed W4A8 path,
round-trip the quantized checkpoint (reference flow: quant_model.py → save →
eval_model.py load)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qqq_tpu.core import QuantSpec
from qqq_tpu.models import (
    ModelConfig,
    forward,
    init_params,
    save_quantized,
    load_quantized,
)
from qqq_tpu.calib.pipeline import apply_gptq

CFG = ModelConfig(
    vocab_size=256,
    hidden_size=128,
    intermediate_size=256,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    max_position_embeddings=128,
)


def _setup(rng):
    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    calib = jnp.asarray(rng.integers(0, 256, size=(8, 32)).astype(np.int32))
    test_tokens = jnp.asarray(rng.integers(0, 256, size=(2, 16)).astype(np.int32))
    return params, calib, test_tokens


def _logit_close(a, b, tol):
    a, b = np.asarray(a), np.asarray(b)
    denom = np.abs(b).max()
    return np.abs(a - b).max() / denom < tol


@pytest.mark.parametrize("group_size", [-1, 128])
def test_gptq_end_to_end(rng, group_size, tmp_path):
    params, calib, test_tokens = _setup(rng)
    spec = QuantSpec(bits=4, group_size=group_size)

    fp_logits, _ = forward(params, CFG, test_tokens)

    qparams, stats = apply_gptq(
        params, CFG, calib, spec, sample_batch=4, pack=True, dtype=jnp.float32
    )
    assert len(stats["layer_losses"]) == CFG.num_hidden_layers
    # every decoder linear is packed, embeddings/lm_head stay FP
    for layer in qparams["layers"]:
        for name in ("q_proj", "k_proj", "v_proj", "o_proj",
                     "gate_proj", "up_proj", "down_proj"):
            assert "w_packed" in layer[name], name
    assert "w" in qparams["lm_head"]

    q_logits, _ = forward(qparams, CFG, test_tokens)
    assert _logit_close(q_logits, fp_logits, 0.25), "quantized logits too far"

    # fake-quant (dense) path should agree closely with the packed path
    dparams, _ = apply_gptq(
        params, CFG, calib, spec, sample_batch=4, pack=False, dtype=jnp.float32
    )
    d_logits, _ = forward(dparams, CFG, test_tokens)
    assert _logit_close(q_logits, d_logits, 0.05), "packed vs dense drift"

    # checkpoint round-trip
    path = str(tmp_path / "ckpt")
    save_quantized(path, qparams, CFG, {
        "quant_method": "qqq", "wbits": 4, "group_size": group_size,
    })
    lparams, lconfig, qc = load_quantized(path, dtype=jnp.float32)
    assert qc["group_size"] == group_size
    assert lconfig.hidden_size == CFG.hidden_size
    l_logits, _ = forward(lparams, lconfig, test_tokens)
    np.testing.assert_allclose(
        np.asarray(l_logits), np.asarray(q_logits), rtol=1e-5, atol=1e-5
    )


def test_gptq_stream_from_host_matches(rng):
    """Host-streamed calibration (7B-on-one-chip path) must produce the same
    packed params as the all-resident path."""
    params, calib, test_tokens = _setup(rng)
    spec = QuantSpec(bits=4, group_size=-1)
    q_resident, _ = apply_gptq(
        params, CFG, calib, spec, sample_batch=4, pack=True, dtype=jnp.float32
    )
    host_params = jax.tree.map(np.asarray, params)
    q_streamed, _ = apply_gptq(
        host_params, CFG, calib, spec, sample_batch=4, pack=True,
        dtype=jnp.float32, stream_from_host=True,
    )
    a = np.asarray(q_resident["layers"][0]["q_proj"]["w_packed"])
    b = np.asarray(q_streamed["layers"][0]["q_proj"]["w_packed"])
    np.testing.assert_array_equal(a, b)
    la, _ = forward(q_resident, CFG, test_tokens)
    lb, _ = forward(q_streamed, CFG, test_tokens)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=1e-5)


def test_quantize_lm_head_option(rng):
    params, calib, test_tokens = _setup(rng)
    spec = QuantSpec(bits=4, group_size=-1)
    q, stats = apply_gptq(
        params, CFG, calib, spec, sample_batch=4, pack=True,
        dtype=jnp.float32, quantize_lm_head=True,
    )
    assert "w_packed" in q["lm_head"]
    assert "lm_head_loss" in stats
    fp_logits, _ = forward(params, CFG, test_tokens)
    q_logits, _ = forward(q, CFG, test_tokens)
    assert _logit_close(q_logits, fp_logits, 0.3)
