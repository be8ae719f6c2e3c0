"""Unit tests for qqq_tpu.core.quant against a NumPy re-derivation and against
the reference semantics (QQQ/gptq/quant.py) re-expressed independently."""

import numpy as np
import jax.numpy as jnp
import pytest

from qqq_tpu.core import (
    QuantSpec,
    quantize_activations_per_token,
    find_params_weight,
    quantize_weight_int,
    fake_quantize_weight,
    dequantize_weight_int,
    int8_channel_scale,
    double_scale,
    requantize_group_weights_int8,
    w4a8_matmul_reference,
    pack_int4,
    unpack_int4,
)

PER_CHANNEL = QuantSpec(bits=4, group_size=-1)
PER_GROUP = QuantSpec(bits=4, group_size=128)


def test_activation_quant_roundtrip(rng):
    x = rng.normal(size=(5, 256)).astype(np.float32) * 3.0
    q, s = quantize_activations_per_token(jnp.asarray(x))
    assert q.dtype == jnp.int8 and s.shape == (5, 1)
    # absmax row element must quantize to ±127
    assert np.all(np.max(np.abs(np.asarray(q)), axis=-1) == 127)
    deq = np.asarray(q, np.float32) * np.asarray(s)
    assert np.allclose(deq, x, atol=np.max(np.abs(x)) / 127 * 0.51 + 1e-6)


def test_activation_quant_zero_row():
    x = jnp.zeros((2, 128))
    q, s = quantize_activations_per_token(x)
    assert np.all(np.asarray(q) == 0)
    assert np.all(np.isfinite(np.asarray(s)))


def test_per_channel_params(rng):
    w = rng.normal(size=(256, 64)).astype(np.float32)
    scale, zero = find_params_weight(jnp.asarray(w), PER_CHANNEL)
    assert scale.shape == (1, 64) and np.all(np.asarray(zero) == 0)
    expected = np.max(np.abs(w), axis=0) / 7.0
    np.testing.assert_allclose(np.asarray(scale)[0], expected, rtol=1e-6)
    q = quantize_weight_int(jnp.asarray(w), scale, zero, PER_CHANNEL)
    qn = np.asarray(q)
    assert qn.min() >= -7 and qn.max() <= 7


def test_per_group_params(rng):
    w = rng.normal(size=(256, 32)).astype(np.float32)
    scale, zero = find_params_weight(jnp.asarray(w), PER_GROUP)
    assert scale.shape == (2, 32)
    assert np.all(np.asarray(zero) == 8)
    # symmetric: scale = 2*absmax/15 per (group, channel)
    absmax = np.abs(w.reshape(2, 128, 32)).max(axis=1)
    np.testing.assert_allclose(np.asarray(scale), 2 * absmax / 15.0, rtol=1e-6)
    q = quantize_weight_int(jnp.asarray(w), scale, zero, PER_GROUP)
    qn = np.asarray(q)
    assert qn.min() >= -8 and qn.max() <= 7


def test_fake_quant_error_bound(rng):
    w = rng.normal(size=(256, 16)).astype(np.float32)
    for spec in (PER_CHANNEL, PER_GROUP):
        deq = np.asarray(fake_quantize_weight(jnp.asarray(w), spec))
        # max error is half a quantization step
        scale, _ = find_params_weight(jnp.asarray(w), spec)
        step = np.asarray(scale).max()
        assert np.max(np.abs(deq - w)) <= step * 0.5 + 1e-6


def test_mse_search_not_worse(rng):
    w = np.concatenate(
        [
            rng.normal(size=(255, 16)).astype(np.float32),
            10.0 * np.ones((1, 16), np.float32),  # outlier row
        ]
    )
    base = QuantSpec(bits=4, group_size=-1, mse=False)
    mse = QuantSpec(bits=4, group_size=-1, mse=True)
    err_base = np.sum(
        np.abs(np.asarray(fake_quantize_weight(jnp.asarray(w), base)) - w) ** 2.4
    )
    err_mse = np.sum(
        np.abs(np.asarray(fake_quantize_weight(jnp.asarray(w), mse)) - w) ** 2.4
    )
    assert err_mse <= err_base + 1e-5


def test_double_scale_bounds(rng):
    """Requantized int8 weights must stay within ±127 exactly as the kernel
    assumes (gptq.py:204-217 guarantees |(q-8)*s| <= absmax = 127*s_extra)."""
    w = rng.normal(size=(256, 32)).astype(np.float32)
    scale, zero = find_params_weight(jnp.asarray(w), PER_GROUP)
    q4 = quantize_weight_int(jnp.asarray(w), scale, zero, PER_GROUP)
    w_deq = dequantize_weight_int(q4, scale, PER_GROUP)
    s_extra = int8_channel_scale(w_deq)
    s_group = double_scale(scale, s_extra)
    w8 = np.asarray(requantize_group_weights_int8(q4, s_group, 128))
    assert w8.min() >= -127 and w8.max() <= 127
    # dequantizing the int8 view with s_extra approximates the int4 dequant
    recon = w8.astype(np.float32) * np.asarray(s_extra)[None, :]
    np.testing.assert_allclose(
        recon, np.asarray(w_deq), atol=np.asarray(s_extra).max() * 0.51
    )


def test_pack_unpack_roundtrip(rng):
    q = rng.integers(-8, 8, size=(384, 128)).astype(np.int8)
    packed = pack_int4(jnp.asarray(q))
    assert packed.shape == (48, 128) and packed.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(unpack_int4(packed)), q)


def test_w4a8_reference_matmul_per_channel(rng):
    M, K, N = 4, 256, 64
    x = rng.normal(size=(M, K)).astype(np.float32)
    w = rng.normal(size=(K, N)).astype(np.float32)
    scale, zero = find_params_weight(jnp.asarray(w), PER_CHANNEL)
    q4 = quantize_weight_int(jnp.asarray(w), scale, zero, PER_CHANNEL)
    aq, s_tok = quantize_activations_per_token(jnp.asarray(x))
    out = w4a8_matmul_reference(
        aq, s_tok, q4, scale[0], group_size=-1, out_dtype=jnp.float32
    )
    expected = x @ np.asarray(dequantize_weight_int(q4, scale, PER_CHANNEL))
    rel = np.abs(np.asarray(out) - expected) / (np.abs(expected).max() + 1e-6)
    assert rel.max() < 0.02  # activation quant noise only


def test_w4a8_reference_matmul_per_group(rng):
    M, K, N = 4, 256, 64
    x = rng.normal(size=(M, K)).astype(np.float32)
    w = rng.normal(size=(K, N)).astype(np.float32)
    scale, zero = find_params_weight(jnp.asarray(w), PER_GROUP)
    q4 = quantize_weight_int(jnp.asarray(w), scale, zero, PER_GROUP)
    w_deq = dequantize_weight_int(q4, scale, PER_GROUP)
    aq, s_tok = quantize_activations_per_token(jnp.asarray(x))
    out = w4a8_matmul_reference(
        aq, s_tok, q4, None, scale, group_size=128, out_dtype=jnp.float32
    )
    expected = x @ np.asarray(w_deq)
    rel = np.abs(np.asarray(out) - expected) / (np.abs(expected).max() + 1e-6)
    assert rel.max() < 0.02  # activation quant noise only (no requant step)
