"""Observer-zoo parity: each of our 13 observers vs the REFERENCE class
(QQQ/smooth/quantization/observer.py) on identical batch streams."""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from qqq_tpu.calib.observers import make_observer, calculate_qparams


@pytest.fixture(scope="module")
def ref():
    from refqqq import get_ref

    try:
        return get_ref()
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference not importable: {e}")


def _batches(rng, n=3, shape=(4, 64), outliers=True):
    out = []
    for i in range(n):
        x = (rng.normal(size=shape) * (1 + i)).astype(np.float32)
        if outliers:
            x.flat[:: x.size // 7] *= 5.0
        out.append(x)
    return out


def _run_ref(ref, cls_name, batches, bit=8, symmetric=True, ch_axis=-1, **kw):
    obs = getattr(ref.observer, cls_name)(
        bit=bit, symmetric=symmetric, ch_axis=ch_axis
    )
    obs.set_name("act_test")
    if "percentile" in kw:
        obs.set_percentile(kw["percentile"])
    for b in batches:
        obs(torch.tensor(b))
    return obs.min_val.numpy(), obs.max_val.numpy(), obs


def _run_ours(name, batches, bit=8, symmetric=True, ch_axis=-1, **kw):
    obs = make_observer(name, bit=bit, symmetric=symmetric, ch_axis=ch_axis,
                        **kw)
    for b in batches:
        obs.update(jnp.asarray(b))
    return np.asarray(obs.min_val), np.asarray(obs.max_val), obs


PAIRS_SIMPLE = [
    ("minmax", "MinMaxObserver", {}),
    ("avg_minmax", "AvgMinMaxObserver", {}),
    ("ema_minmax", "EMAMinMaxObserver", {}),
    ("lsq_plus", "LSQPlusObserver", {}),
]


@pytest.mark.parametrize("ours,theirs,kw", PAIRS_SIMPLE)
def test_simple_observer_parity(rng, ref, ours, theirs, kw):
    batches = _batches(rng)
    mn_r, mx_r, _ = _run_ref(ref, theirs, batches, **kw)
    mn_o, mx_o, _ = _run_ours(ours, batches, **kw)
    np.testing.assert_allclose(mn_o, mn_r, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(mx_o, mx_r, rtol=1e-5, atol=1e-6)


def test_minmax_per_channel_parity(rng, ref):
    batches = _batches(rng, shape=(4, 16, 32))
    mn_r, mx_r, _ = _run_ref(ref, "MinMaxObserver", batches, ch_axis=0)
    mn_o, mx_o, _ = _run_ours("minmax", batches, ch_axis=0)
    np.testing.assert_allclose(mn_o, mn_r, rtol=1e-6)
    np.testing.assert_allclose(mx_o, mx_r, rtol=1e-6)


def test_quantile_token_pruning_parity(rng, ref):
    """QuantileObserver per-'channel' where channels = tokens: prunes outlier
    tokens at the percentile before taking per-token ranges."""
    batches = _batches(rng, n=1, shape=(64, 32))  # rows = tokens
    mn_r, mx_r, _ = _run_ref(
        ref, "QuantileObserver", batches, ch_axis=0, percentile=0.95
    )
    mn_o, mx_o, _ = _run_ours(
        "quantile", batches, ch_axis=0, percentile=0.95
    )
    np.testing.assert_allclose(mn_o, mn_r, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(mx_o, mx_r, rtol=1e-5, atol=1e-6)


def test_avg_token_quantile_parity(rng, ref):
    batches = _batches(rng, n=2, shape=(2, 24, 32))
    mask = torch.ones(2, 24, dtype=torch.long)
    obs_r = ref.observer.AvgTokenQuantileObserver(bit=8, symmetric=True,
                                                  ch_axis=-1)
    obs_r.set_name("act_test")
    obs_r.set_percentile(0.9)
    for b in batches:
        obs_r(torch.tensor(b), observation_mask=mask, seq_pos=1)
    obs_o = make_observer("avg_token_quantile", bit=8, symmetric=True,
                          ch_axis=-1, percentile=0.9)
    for b in batches:
        obs_o.update(jnp.asarray(b), mask=np.ones((2, 24), bool))
    np.testing.assert_allclose(
        np.asarray(obs_o.min_val), obs_r.min_val.numpy(), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(obs_o.max_val), obs_r.max_val.numpy(), rtol=1e-5
    )


@pytest.mark.parametrize("ours,theirs", [
    ("ema_quantile", "EMAQuantileObserver"),
    ("avg_quantile", "AvgQuantileObserver"),
])
def test_histogram_quantile_parity(rng, ref, ours, theirs):
    batches = _batches(rng, n=3, shape=(16, 128))
    mn_r, mx_r, _ = _run_ref(ref, theirs, batches)
    mn_o, mx_o, _ = _run_ours(ours, batches)
    # torch.histc and jnp.histogram may disagree by one bin at edges
    span = float(max(abs(mn_r), abs(mx_r)))
    atol = span / 512  # 4 bins of 2048
    np.testing.assert_allclose(mn_o, mn_r, atol=atol)
    np.testing.assert_allclose(mx_o, mx_r, atol=atol)


@pytest.mark.parametrize("symmetric", [True, False])
def test_mse_observer_parity(rng, ref, symmetric):
    """1D grid (symmetric) and 2D range×zp grid (asymmetric, two-sided)."""
    batches = _batches(rng, n=2, shape=(8, 32))
    bit = 4  # keeps the reference's 2D loop (num × 16 zp) fast
    mn_r, mx_r, _ = _run_ref(ref, "MSEObserver", batches, bit=bit,
                             symmetric=symmetric)
    mn_o, mx_o, _ = _run_ours("mse", batches, bit=bit, symmetric=symmetric)
    np.testing.assert_allclose(mn_o, mn_r, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(mx_o, mx_r, rtol=1e-4, atol=1e-5)


def test_mse_observer_per_channel_parity(rng, ref):
    batches = _batches(rng, n=1, shape=(16, 8))
    mn_r, mx_r, _ = _run_ref(ref, "MSEObserver", batches, bit=4,
                             symmetric=True, ch_axis=1)
    mn_o, mx_o, _ = _run_ours("mse", batches, bit=4, symmetric=True,
                              ch_axis=1)
    np.testing.assert_allclose(mn_o, mn_r, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(mx_o, mx_r, rtol=1e-4, atol=1e-5)


def test_avg_mse_observer_parity(rng, ref):
    batches = _batches(rng, n=3, shape=(8, 32))
    mn_r, mx_r, _ = _run_ref(ref, "AvgMSEObserver", batches, bit=4)
    mn_o, mx_o, _ = _run_ours("avg_mse", batches, bit=4)
    np.testing.assert_allclose(mn_o, mn_r, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(mx_o, mx_r, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("ours,theirs,symmetric", [
    ("mse_fast", "MSEFastObserver", True),
    ("mse_fast", "MSEFastObserver", False),
    ("avg_mse_fast", "AvgMSEFastObserver", True),
    ("ema_mse_fast", "EMAMSEFastObserver", True),
])
def test_mse_fast_parity(rng, ref, ours, theirs, symmetric):
    """Same scipy Bounded minimize_scalar driver as the reference — iterates
    can differ at fp32 noise, so compare the resulting ranges loosely."""
    batches = _batches(rng, n=2, shape=(8, 32))
    mn_r, mx_r, _ = _run_ref(ref, theirs, batches, bit=8,
                             symmetric=symmetric)
    mn_o, mx_o, _ = _run_ours(ours, batches, bit=8, symmetric=symmetric)
    span = float(max(abs(mn_r), abs(mx_r)))
    np.testing.assert_allclose(mn_o, mn_r, atol=0.02 * span)
    np.testing.assert_allclose(mx_o, mx_r, atol=0.02 * span)


def test_calculate_qparams_matches_reference(rng, ref):
    for bit, symmetric in [(8, True), (8, False), (4, True), (4, False)]:
        obs_r = ref.observer.MinMaxObserver(bit=bit, symmetric=symmetric,
                                            ch_axis=-1)
        mn = torch.tensor(-2.7)
        mx = torch.tensor(4.1)
        s_r, z_r = obs_r.calculate_qparams(mn, mx)
        s_o, z_o = calculate_qparams(
            jnp.float32(-2.7), jnp.float32(4.1), bit, symmetric
        )
        np.testing.assert_allclose(float(s_o), s_r.item(), rtol=1e-6)
        np.testing.assert_allclose(float(z_o), float(z_r.item()), atol=0)
