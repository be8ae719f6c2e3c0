"""Rotation subsystem: Hadamard construction + network-function invariance.

The load-bearing property (reference rotation.py:169-195): after
fuse_layer_norms + rotate_model, the model computes the *same function* —
rotation must be output-invariant before quantization enters.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qqq_tpu.core.hadamard import (
    hadamard_base,
    hadamard_matrix,
    get_hadK,
    random_hadamard_matrix,
)
from qqq_tpu.models import ModelConfig, forward, init_params
from qqq_tpu.calib.rotation import (
    fuse_layer_norms,
    rotate_model,
    get_orthogonal_matrix,
)


@pytest.mark.parametrize(
    "K", [12, 20, 28, 36, 40, 44, 52, 60, 108, 140, 156, 172]
)
def test_hadamard_bases_exact(K):
    """All eleven reference table orders (hadamard_utils.py:16-57) plus 44
    are exact ±1 Hadamard blocks — including the Williamson-type 156/172
    (tabulated, core/hadamard_tables.py)."""
    H = hadamard_base(K)
    assert np.array_equal(H @ H.T, K * np.eye(K, dtype=np.int64))
    assert set(np.unique(H)) <= {-1, 1}


@pytest.mark.parametrize("K", [156, 172])
def test_hadamard_tables_match_reference(K):
    """Bit-packed Sloane tables decode to the same public data the
    reference vendors (hadamard_utils.py:42880/:67535) — parity-checked
    when the reference is importable."""
    from tests import refqqq

    try:
        hu = refqqq.get_ref().hadamard
    except ImportError as e:  # pragma: no cover
        pytest.skip(f"reference unavailable: {e}")
    ref_H = (hu.get_had156() if K == 156 else hu.get_had172()).numpy()
    np.testing.assert_array_equal(hadamard_base(K), ref_H.astype(np.int64))


@pytest.mark.parametrize("n", [64, 5120, 1408, 4864, 688])
def test_hadamard_matrix_orthogonal(n):
    """Covers pure pow2, K=40 (llama-1-13b), K=11, K=19 (qwen2-0.5b
    intermediate /4), K=172/16 scaled-down analogues."""
    H = hadamard_matrix(n)
    np.testing.assert_allclose(H @ H.T, np.eye(n), atol=1e-9)


def test_reference_dims_factor():
    """Every Llama-1/2/3 & Qwen2 hidden/intermediate dim must factor."""
    dims = [4096, 5120, 6656, 8192, 3584, 11008, 13824, 17920, 22016,
            14336, 28672, 18944, 4864, 8960, 896, 1536]
    for n in dims:
        _, K = get_hadK(n)
        assert n % K == 0 and ((n // K) & (n // K - 1)) == 0, n


def test_random_hadamard_orthogonal():
    Q = random_hadamard_matrix(256, seed=3)
    np.testing.assert_allclose(Q @ Q.T, np.eye(256), atol=1e-9)


@pytest.mark.parametrize("mode", ["hadamard", "random"])
@pytest.mark.parametrize("tie", [False, True])
def test_rotation_invariance(rng, mode, tie):
    config = ModelConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        tie_word_embeddings=tie,
    )
    params = init_params(config, jax.random.PRNGKey(0), dtype=jnp.float32)
    # non-trivial LN weights so fusion actually does something
    for layer in params["layers"]:
        layer["input_layernorm"] = jnp.asarray(
            rng.uniform(0.5, 1.5, 64).astype(np.float32)
        )
        layer["post_attention_layernorm"] = jnp.asarray(
            rng.uniform(0.5, 1.5, 64).astype(np.float32)
        )
    params["norm"] = jnp.asarray(rng.uniform(0.5, 1.5, 64).astype(np.float32))

    tokens = jnp.asarray(rng.integers(0, 128, size=(2, 10)).astype(np.int32))
    base_logits, _ = forward(params, config, tokens)

    fused = fuse_layer_norms(params, config)
    fused_logits, _ = forward(fused, config, tokens)
    scale = float(jnp.abs(base_logits).max())
    np.testing.assert_allclose(
        np.asarray(fused_logits), np.asarray(base_logits),
        atol=2e-4 * scale,
    )

    rotated, Q = rotate_model(fused, config, mode=mode, seed=1)
    np.testing.assert_allclose(Q @ Q.T, np.eye(64), atol=1e-9)
    rot_logits, _ = forward(rotated, config, tokens)
    np.testing.assert_allclose(
        np.asarray(rot_logits), np.asarray(base_logits), atol=2e-3 * scale
    )


def test_rotate_model_reuses_q(rng):
    config = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=96,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=4,
    )
    params = init_params(config, jax.random.PRNGKey(1), dtype=jnp.float32)
    fused = fuse_layer_norms(params, config)
    Q = get_orthogonal_matrix(64, "hadamard", seed=7)
    r1, Q1 = rotate_model(fused, config, Q=Q)
    assert Q1 is Q
    r2, _ = rotate_model(fused, config, Q=Q)
    np.testing.assert_array_equal(
        np.asarray(r1["layers"][0]["q_proj"]["w"]),
        np.asarray(r2["layers"][0]["q_proj"]["w"]),
    )
