"""Observer zoo: range semantics and qparams vs NumPy re-derivations."""

import numpy as np
import jax.numpy as jnp
import pytest

from qqq_tpu.calib.observers import (
    OBSERVERS,
    calculate_qparams,
    make_observer,
)


def test_qparams_symmetric():
    # reference ObserverBase: symmetric quant range is ±(2^(b-1)-1), so the
    # scale is absmax/127 (observer.py:36-42) — verified reference-exact in
    # test_reference_parity.py
    s, z = calculate_qparams(jnp.float32(-3.0), jnp.float32(5.0), 8, True)
    assert float(s) == pytest.approx(5.0 / 127.0)
    assert float(z) == 0.0


def test_qparams_asymmetric():
    # reference asymmetric range is [0, 2^b - 1] (observer.py:39-42)
    s, z = calculate_qparams(jnp.float32(-1.0), jnp.float32(3.0), 8, False)
    assert float(s) == pytest.approx(4.0 / 255)
    # zero = qmin - round(min/scale) clamped into [0, 255]
    assert float(z) == pytest.approx(
        np.clip(0 - np.round(-1.0 / (4.0 / 255)), 0, 255)
    )


def test_minmax_last_batch_wins(rng):
    obs = make_observer("minmax", ch_axis=-1)
    obs.update(jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32) * 10))
    x2 = rng.normal(size=(4, 8)).astype(np.float32)
    obs.update(jnp.asarray(x2))
    assert float(obs.max_val) == pytest.approx(x2.max())
    assert float(obs.min_val) == pytest.approx(x2.min())


def test_avg_minmax_running_mean(rng):
    obs = make_observer("avg_minmax", ch_axis=-1)
    batches = [rng.normal(size=(16,)).astype(np.float32) for _ in range(3)]
    for b in batches:
        obs.update(jnp.asarray(b))
    assert float(obs.max_val) == pytest.approx(
        np.mean([b.max() for b in batches]), rel=1e-5
    )


def test_ema_minmax(rng):
    obs = make_observer("ema_minmax", ch_axis=-1, ema_ratio=0.5)
    obs.update(jnp.asarray(np.asarray([1.0, -1.0], np.float32)))
    obs.update(jnp.asarray(np.asarray([3.0, -5.0], np.float32)))
    assert float(obs.max_val) == pytest.approx(0.5 * 1 + 0.5 * 3)
    assert float(obs.min_val) == pytest.approx(0.5 * -1 + 0.5 * -5)


def test_quantile_prunes_outlier_tokens(rng):
    """Reference QuantileObserver semantics: per-tensor is plain minmax;
    token-axis (ch_axis=0) prunes outlier TOKENS at the percentile
    (observer.py:85-93, 153-180)."""
    x = rng.normal(size=(200, 32)).astype(np.float32)
    x[0, :] = 1000.0  # one outlier token
    obs = make_observer("quantile", ch_axis=0, percentile=0.98)
    obs.update(jnp.asarray(x))
    assert float(jnp.max(obs.max_val)) < 10.0  # outlier token clipped
    # per-tensor path keeps the reference's plain-minmax behavior
    obs2 = make_observer("quantile", ch_axis=-1, percentile=0.98)
    obs2.update(jnp.asarray(x))
    assert float(obs2.max_val) == pytest.approx(1000.0)


def test_per_channel_axis(rng):
    x = rng.normal(size=(6, 4)).astype(np.float32)
    obs = make_observer("minmax", ch_axis=1)
    obs.update(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(obs.max_val), x.max(axis=0), rtol=1e-6)


def test_mse_observer_not_worse_than_minmax(rng):
    """MSE search must achieve ≤ the minmax clip's reconstruction error."""
    x = np.concatenate(
        [rng.normal(size=(4095,)), np.asarray([40.0])]
    ).astype(np.float32)

    def recon_err(obs_name, **kw):
        obs = make_observer(obs_name, bit=8, symmetric=True, ch_axis=-1, **kw)
        obs.update(jnp.asarray(x))
        s, z = obs.qparams()
        q = np.clip(np.round(x / float(s)), -128, 127)
        return np.sum(np.abs(q * float(s) - x) ** 2.4)

    assert recon_err("mse") <= recon_err("minmax") * 1.001
    assert recon_err("mse_fast") <= recon_err("minmax") * 1.001


def test_observation_mask(rng):
    x = rng.normal(size=(2, 8)).astype(np.float32)
    x[1, :] = 99.0  # padding row
    mask = np.zeros((2, 8), bool)
    mask[0, :] = True
    obs = make_observer("minmax", ch_axis=-1)
    obs.update(jnp.asarray(x), mask=jnp.asarray(mask))
    assert float(obs.max_val) == pytest.approx(x[0].max())


@pytest.mark.parametrize("name", sorted(OBSERVERS))
def test_all_observers_produce_qparams(rng, name):
    x = rng.normal(size=(4, 64)).astype(np.float32)
    obs = make_observer(name, bit=8, symmetric=True, ch_axis=-1)
    obs.update(jnp.asarray(x))
    s, z = obs.qparams()
    assert np.all(np.asarray(s) > 0)


def test_token_wise_clipping_search(rng):
    """The ratio sweep must run and return a valid ratio; on outlier-heavy
    activations a sub-1.0 ratio should not be much worse than 1.0."""
    import jax
    from qqq_tpu.models import ModelConfig, init_params
    from qqq_tpu.calib.clipping import token_wise_clipping_search

    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=96,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=4,
    )
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    calib = jnp.asarray(rng.integers(0, 64, size=(2, 16)).astype(np.int32))
    ratio, loss = token_wise_clipping_search(
        params, cfg, calib, step=0.01, iters=3
    )
    assert 0.97 <= ratio <= 1.0
    assert np.isfinite(loss)
