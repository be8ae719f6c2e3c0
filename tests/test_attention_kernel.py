"""Fused INT8-KV flash-decode attention vs a jnp oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qqq_tpu.kernels.attention import decode_attention_int8


def _oracle(q, k8, ks, v8, vs, clen):
    """Dense softmax attention over the dequantized cache (f64 softmax)."""
    B, nh, hd = q.shape
    nkv, S = k8.shape[1], k8.shape[2]
    g = nh // nkv
    k = k8.astype(np.float64) * ks[..., None]  # (B, nkv, S, hd)
    v = v8.astype(np.float64) * vs[..., None]
    out = np.zeros((B, nh, hd))
    for b in range(B):
        for h in range(nh):
            kh = h // g
            scores = (q[b, h].astype(np.float64) @ k[b, kh].T) / np.sqrt(hd)
            scores[clen[b]:] = -np.inf
            p = np.exp(scores - scores.max())
            p /= p.sum()
            out[b, h] = p @ v[b, kh]
    return out


@pytest.mark.parametrize("B,nh,nkv,S,_bs", [
    (2, 8, 4, 256, 128),   # GQA
    (1, 4, 4, 512, 512),   # MHA, single block
    (3, 8, 2, 384, 128),   # non-pow2 block count
])
def test_decode_attention_matches_oracle(rng, B, nh, nkv, S, _bs):
    hd = 128
    q = rng.normal(size=(B, nh, hd)).astype(np.float32)
    k8 = rng.integers(-127, 128, size=(B, nkv, S, hd)).astype(np.int8)
    v8 = rng.integers(-127, 128, size=(B, nkv, S, hd)).astype(np.int8)
    ks = rng.uniform(0.005, 0.02, size=(B, nkv, S)).astype(np.float32)
    vs = rng.uniform(0.005, 0.02, size=(B, nkv, S)).astype(np.float32)
    clen = rng.integers(1, S + 1, size=(B,)).astype(np.int32)

    got = decode_attention_int8(
        jnp.asarray(q), jnp.asarray(k8), jnp.asarray(ks),
        jnp.asarray(v8), jnp.asarray(vs), jnp.asarray(clen),
        interpret=True,
    )
    want = _oracle(q, k8, ks, v8, vs, clen)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_decode_attention_clen_one(rng):
    """Degenerate context of a single token: output = that token's value."""
    B, nh, nkv, S, hd = 1, 4, 2, 128, 128
    q = rng.normal(size=(B, nh, hd)).astype(np.float32)
    k8 = rng.integers(-127, 128, size=(B, nkv, S, hd)).astype(np.int8)
    v8 = rng.integers(-127, 128, size=(B, nkv, S, hd)).astype(np.int8)
    ks = np.full((B, nkv, S), 0.01, np.float32)
    vs = np.full((B, nkv, S), 0.01, np.float32)
    clen = np.asarray([1], np.int32)
    got = decode_attention_int8(
        jnp.asarray(q), jnp.asarray(k8), jnp.asarray(ks),
        jnp.asarray(v8), jnp.asarray(vs), jnp.asarray(clen), interpret=True,
    )
    want = (v8[:, :, 0].astype(np.float32) * 0.01)
    want = np.repeat(want, nh // nkv, axis=1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)
