"""GPTQ core vs an independent NumPy port of the reference algorithm
(QQQ/gptq/gptq.py semantics, static_groups=True), plus sanity properties."""

import numpy as np
import jax.numpy as jnp
import pytest

from qqq_tpu.core import QuantSpec, find_params_weight, fake_quantize_weight
from qqq_tpu.calib import hessian_init, hessian_update, gptq_quantize_matrix


def numpy_gptq(W, H, spec, blocksize=32, percdamp=0.01, actorder=True):
    """Sequential NumPy GPTQ in our (K, N) layout — direct re-expression of
    gptq.py:61-217 with static_groups."""
    W = W.astype(np.float64).copy()
    K, N = W.shape
    g = K if spec.per_channel else spec.group_size
    maxq = spec.maxq

    dead = np.diag(H) == 0
    H = H.copy()
    H[dead, dead] = 1.0
    W[dead, :] = 0.0

    scale_g, zero_g = (np.asarray(a, np.float64) for a in
                       find_params_weight(jnp.asarray(W, jnp.float32), spec))

    if actorder:
        perm = np.argsort(-np.diag(H), kind="stable")
        W = W[perm, :]
        H = H[perm][:, perm]
        invperm = np.argsort(perm)
    else:
        perm = np.arange(K)
        invperm = perm

    damp = percdamp * np.mean(np.diag(H))
    H = H + np.eye(K) * damp
    Hinv_full = np.linalg.inv(H)
    Hinv = np.linalg.cholesky(Hinv_full).T  # upper U with Hinv = Uᵀ U

    Q = np.zeros_like(W)
    for i1 in range(0, K, blocksize):
        i2 = min(i1 + blocksize, K)
        Wb = W[i1:i2, :].copy()
        Err = np.zeros_like(Wb)
        for i in range(i2 - i1):
            w = Wb[i, :]
            grp = perm[i1 + i] // g
            s, z = scale_g[grp], zero_g[grp]
            if spec.per_channel and spec.sym:
                q = np.clip(np.round(w / s), -maxq, maxq)
                deq = s * q
            else:
                q = np.clip(np.round(w / s) + z, 0, maxq)
                deq = s * (q - z)
            d = Hinv[i1 + i, i1 + i]
            err = (w - deq) / d
            Wb[i + 1 :, :] -= np.outer(Hinv[i1 + i, i1 + 1 + i : i2], err)
            Err[i, :] = err
            Q[i1 + i, :] = deq
        W[i2:, :] -= Hinv[i1:i2, i2:].T @ Err
    return Q[invperm, :]


def _make_problem(rng, K, N, nsamples=64):
    W = rng.normal(size=(K, N)).astype(np.float32)
    # correlated inputs → GPTQ has something to exploit
    base = rng.normal(size=(nsamples, K)).astype(np.float32)
    mix = rng.normal(size=(K, K)).astype(np.float32) * 0.2 + np.eye(K)
    X = base @ mix
    H, n = hessian_init(K)
    H, n = hessian_update(H, n, jnp.asarray(X))
    return W, np.asarray(H), X


@pytest.mark.parametrize("group_size,actorder", [(-1, False), (-1, True),
                                                 (64, False), (64, True)])
def test_gptq_matches_numpy_reference(rng, group_size, actorder):
    K, N = 128, 32
    spec = QuantSpec(bits=4, group_size=group_size)
    W, H, _ = _make_problem(rng, K, N)
    res = gptq_quantize_matrix(
        jnp.asarray(W), jnp.asarray(H), spec, blocksize=32, actorder=actorder
    )
    want = numpy_gptq(W, H, spec, blocksize=32, actorder=actorder)
    got = np.asarray(res.w_deq)
    # both are f32/f64 runs of the same algorithm; quantized values live on
    # the same discrete grid so agreement should be near-exact
    mismatch = np.mean(~np.isclose(got, want, rtol=1e-4, atol=1e-5))
    assert mismatch < 0.02, f"{mismatch:.4f} of entries differ"


def test_gptq_beats_rtn(rng):
    """On correlated inputs, GPTQ must reduce output error vs round-to-nearest
    (the whole point of Hessian compensation)."""
    K, N = 128, 64
    spec = QuantSpec(bits=4, group_size=-1)
    W, H, X = _make_problem(rng, K, N, nsamples=256)
    res = gptq_quantize_matrix(jnp.asarray(W), jnp.asarray(H), spec)
    rtn = np.asarray(fake_quantize_weight(jnp.asarray(W), spec))
    err_gptq = np.linalg.norm(X @ np.asarray(res.w_deq) - X @ W)
    err_rtn = np.linalg.norm(X @ rtn - X @ W)
    assert err_gptq < err_rtn


def test_gptq_codes_consistent(rng):
    """q4 codes × scales must reproduce w_deq."""
    K, N = 128, 32
    spec = QuantSpec(bits=4, group_size=64)
    W, H, _ = _make_problem(rng, K, N)
    res = gptq_quantize_matrix(jnp.asarray(W), jnp.asarray(H), spec)
    g = 64
    scale_rows = np.repeat(np.asarray(res.scale), g, axis=0)
    recon = np.asarray(res.q4, np.float32) * scale_rows
    np.testing.assert_allclose(recon, np.asarray(res.w_deq), rtol=1e-5, atol=1e-6)
    assert np.asarray(res.q4).min() >= -8 and np.asarray(res.q4).max() <= 7


def test_hessian_update_running_mean(rng):
    X1 = rng.normal(size=(32, 16)).astype(np.float32)
    X2 = rng.normal(size=(48, 16)).astype(np.float32)
    H, n = hessian_init(16)
    H, n = hessian_update(H, n, jnp.asarray(X1))
    H, n = hessian_update(H, n, jnp.asarray(X2))
    X = np.concatenate([X1, X2])
    want = 2.0 / 80 * X.T @ X
    np.testing.assert_allclose(np.asarray(H), want, rtol=1e-4, atol=1e-5)
