"""Data loaders + evaluation harness."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qqq_tpu.models import ModelConfig, forward, init_params
from qqq_tpu.utils.data import get_loaders
from qqq_tpu.utils.eval import perplexity, loglikelihood

CFG = ModelConfig(
    vocab_size=128,
    hidden_size=64,
    intermediate_size=96,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
)


def test_synthetic_loader_shapes():
    calib, test = get_loaders("synthetic", nsamples=5, seqlen=16,
                              vocab_size=99)
    assert calib.shape == (5, 16) and calib.dtype == np.int32
    assert calib.max() < 99
    assert test is not None and test.ndim == 1


class _FakeTok:
    """Byte-level stand-in tokenizer (no offline tokenizer files exist)."""

    def __call__(self, text):
        class R:
            input_ids = [b % 120 for b in text.encode()]
        return R()


def test_local_file_loader(tmp_path, monkeypatch):
    """The reference's get_custom_data is a NotImplementedError stub
    (data_utils.py:177-180); ours must actually work."""
    import qqq_tpu.utils.data as data_mod

    monkeypatch.setattr(data_mod, "_tokenizer", lambda p: _FakeTok())
    path = tmp_path / "corpus.jsonl"
    with open(path, "w") as f:
        for i in range(20):
            f.write(json.dumps({"text": f"hello world number {i} " * 30}) + "\n")
    calib, ids = get_loaders(str(path), "unused", nsamples=3, seqlen=32)
    assert calib.shape == (3, 32)
    assert ids.ndim == 1 and ids.shape[0] > 100
    # reference RNG protocol: same seed → same crops
    calib2, _ = get_loaders(str(path), "unused", nsamples=3, seqlen=32)
    np.testing.assert_array_equal(calib, calib2)


def test_perplexity_uniform_model(rng):
    """A model with ~uniform logits must give ppl ≈ vocab_size."""
    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    # zero all weights → logits constant → uniform distribution
    params = jax.tree.map(lambda x: jnp.zeros_like(x), params)
    test_tokens = rng.integers(0, 128, size=(16 * 8,)).astype(np.int32)
    ppl = perplexity(params, CFG, test_tokens, seqlen=16)
    assert ppl == pytest.approx(128.0, rel=0.01)


def test_perplexity_matches_manual(rng):
    params = init_params(CFG, jax.random.PRNGKey(1), dtype=jnp.float32)
    test_tokens = rng.integers(0, 128, size=(12 * 4,)).astype(np.int32)
    ppl = perplexity(params, CFG, test_tokens, seqlen=12)
    # manual: mean CE over all shifted positions of all windows
    nll = []
    for i in range(4):
        tok = jnp.asarray(test_tokens[i * 12 : (i + 1) * 12][None])
        logits, _ = forward(params, CFG, tok)
        logp = jax.nn.log_softmax(np.asarray(logits)[0, :-1], axis=-1)
        nll += [-logp[t, test_tokens[i * 12 + t + 1]] for t in range(11)]
    assert ppl == pytest.approx(float(np.exp(np.mean(nll))), rel=1e-4)


def test_loglikelihood_additivity(rng):
    """ll(ctx, a+b) == ll(ctx, a) + ll(ctx+a, b)."""
    params = init_params(CFG, jax.random.PRNGKey(2), dtype=jnp.float32)
    ctx = [int(t) for t in rng.integers(0, 128, size=5)]
    a = [int(t) for t in rng.integers(0, 128, size=3)]
    b = [int(t) for t in rng.integers(0, 128, size=2)]
    ll_ab, _ = loglikelihood(params, CFG, ctx, a + b)
    ll_a, _ = loglikelihood(params, CFG, ctx, a)
    ll_b, _ = loglikelihood(params, CFG, ctx + a, b)
    assert ll_ab == pytest.approx(ll_a + ll_b, rel=1e-4, abs=1e-3)


def test_loglikelihood_batch_matches_single(rng):
    """Bucketed/padded batch scoring must equal per-example scoring."""
    from qqq_tpu.utils.eval import loglikelihood_batch

    params = init_params(CFG, jax.random.PRNGKey(3), dtype=jnp.float32)
    pairs = []
    for _ in range(5):
        c = [int(t) for t in rng.integers(0, 128, size=rng.integers(3, 20))]
        t = [int(x) for x in rng.integers(0, 128, size=rng.integers(1, 6))]
        pairs.append((c, t))
    batched = loglikelihood_batch(params, CFG, pairs, batch_size=2,
                                  buckets=(16, 32))
    for (c, t), (ll_b, greedy_b) in zip(pairs, batched):
        ll_s, greedy_s = loglikelihood(params, CFG, c, t)
        assert ll_b == pytest.approx(ll_s, rel=1e-5, abs=1e-4)
