"""Quantization range observers — the reference's estimator zoo, functional.

Re-derivation of QQQ/smooth/quantization/observer.py as pure functions over
``(state, batch) → state`` with a shared ``qparams`` finisher.  The reference
implements 13 nn.Module observers with running buffers; here each is a
``RangeObserver`` subclass with jnp state so they compose with jit/scan.

Covered (reference line refs):
* minmax        MinMaxObserver         :125-150  (last-batch min/max)
* ema_minmax    EMAMinMaxObserver      :242-270  (EMA over batches)
* avg_minmax    AvgMinMaxObserver      :212-239  (running mean of batch ranges)
* quantile      QuantileObserver       :153-180  (percentile clip)
* avg_token_quantile AvgTokenQuantileObserver :273-305
* mse           MSEObserver            :417-519  (grid search, shrink 0.8/80)
* avg_mse       AvgMSEObserver         :522-556
* mse_fast      MSEFastObserver        :559-699  (golden-section 1-D search)

``calculate_qparams`` mirrors observer.py:103-122: symmetric scale =
max(|min|, max) / ((qmax - qmin)/2); asymmetric affine with clamped zero.
Observation masks (padding removal, observer.py:77-88) are supported via an
optional boolean mask.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_EPS = 1.1920929e-07  # torch.finfo(float32).eps, observer.py eps buffer


def _flatten_ch(x: jax.Array, ch_axis: int) -> jax.Array:
    """(…, C, …) → (C, rest): reference _transform_to_ch_axis."""
    x = jnp.moveaxis(x, ch_axis, 0)
    return x.reshape(x.shape[0], -1)


def quant_range(bit: int, symmetric: bool) -> Tuple[int, int]:
    """observer.py:36-42: symmetric range is ±(2^(b-1)-1) — note quant_min is
    -(2^(b-1)) **+ 1**, so the 8-bit symmetric scale is absmax/127 (matching
    the deployed kernel's dynamic quant), NOT absmax/127.5."""
    if symmetric:
        return -(2 ** (bit - 1)) + 1, 2 ** (bit - 1) - 1
    return 0, 2**bit - 1


def calculate_qparams(
    min_val: jax.Array, max_val: jax.Array, bit: int, symmetric: bool
) -> Tuple[jax.Array, jax.Array]:
    quant_min, quant_max = quant_range(bit, symmetric)
    min_neg = jnp.minimum(min_val, 0.0)
    max_pos = jnp.maximum(max_val, 0.0)
    if symmetric:
        max_pos = jnp.maximum(-min_neg, max_pos)
        scale = jnp.maximum(max_pos / ((quant_max - quant_min) / 2.0), _EPS)
        zero = jnp.zeros_like(scale)
    else:
        scale = jnp.maximum((max_pos - min_neg) / (quant_max - quant_min), _EPS)
        zero = jnp.clip(
            quant_min - jnp.round(min_neg / scale), quant_min, quant_max
        )
    return scale, zero


@dataclasses.dataclass
class RangeObserver:
    """Base: tracks (min_val, max_val); subclasses override update rule."""

    bit: int = 8
    symmetric: bool = True
    ch_axis: int = -1  # -1 = per-tensor
    min_val: Optional[jax.Array] = None
    max_val: Optional[jax.Array] = None
    _count: int = 0

    def _batch_range(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        if self.ch_axis == -1:
            return jnp.min(x), jnp.max(x)
        y = _flatten_ch(x, self.ch_axis)
        return jnp.min(y, axis=1), jnp.max(y, axis=1)

    def _combine(self, cur_min, cur_max):
        return cur_min, cur_max  # MinMax: last batch wins (reference :148-149)

    def update(self, x: jax.Array, mask: Optional[jax.Array] = None):
        x = x.astype(jnp.float32)
        if mask is not None:
            assert self.ch_axis == -1, "mask only for per-tensor observers"
            x = jnp.where(mask, x, jnp.nan)
            cur_min = jnp.nanmin(x)
            cur_max = jnp.nanmax(x)
        else:
            cur_min, cur_max = self._batch_range(x)
        self.min_val, self.max_val = self._combine(cur_min, cur_max)
        self._count += 1
        return self.min_val, self.max_val

    def qparams(self) -> Tuple[jax.Array, jax.Array]:
        assert self.min_val is not None, "observer saw no data"
        return calculate_qparams(
            self.min_val, self.max_val, self.bit, self.symmetric
        )


@dataclasses.dataclass
class EMAMinMaxObserver(RangeObserver):
    """observer.py:242-270: exponential moving average of batch ranges."""

    ema_ratio: float = 0.9

    def _combine(self, cur_min, cur_max):
        if self.min_val is None:
            return cur_min, cur_max
        r = self.ema_ratio
        return (
            self.min_val * r + cur_min * (1 - r),
            self.max_val * r + cur_max * (1 - r),
        )


@dataclasses.dataclass
class AvgMinMaxObserver(RangeObserver):
    """observer.py:212-239: running mean of batch ranges."""

    def _combine(self, cur_min, cur_max):
        if self.min_val is None:
            return cur_min, cur_max
        c = self._count
        return (
            (self.min_val * c + cur_min) / (c + 1),
            (self.max_val * c + cur_max) / (c + 1),
        )


@dataclasses.dataclass
class QuantileObserver(RangeObserver):
    """observer.py:153-180: clip ranges at a percentile of the distribution."""

    percentile: float = 0.999

    def _batch_range(self, x):
        if self.ch_axis == -1:
            flat = x.reshape(-1)
            lo = jnp.quantile(flat, 1.0 - self.percentile)
            hi = jnp.quantile(flat, self.percentile)
            return lo, hi
        y = _flatten_ch(x, self.ch_axis)
        lo = jnp.quantile(y, 1.0 - self.percentile, axis=1)
        hi = jnp.quantile(y, self.percentile, axis=1)
        return lo, hi


@dataclasses.dataclass
class AvgTokenQuantileObserver(RangeObserver):
    """observer.py:273-305: per-token ranges averaged with quantile pruning —
    drops the most extreme tokens before averaging."""

    prune_ratio: float = 0.01

    def _batch_range(self, x):
        assert self.ch_axis == -1
        tok = x.reshape(-1, x.shape[-1])
        t_min = jnp.min(tok, axis=1)
        t_max = jnp.max(tok, axis=1)
        k = max(int(tok.shape[0] * (1 - self.prune_ratio)), 1)
        t_min = jnp.sort(t_min)[::-1][:k]   # drop most-negative outliers
        t_max = jnp.sort(t_max)[:k]         # drop most-positive outliers
        return jnp.mean(t_min), jnp.mean(t_max)


@dataclasses.dataclass
class MSEObserver(RangeObserver):
    """observer.py:417-519: shrink-grid search minimizing fake-quant MSE
    (p-norm 2.4), vectorized with a scan over the grid."""

    maxshrink: float = 0.8
    grid: int = 80
    norm_p: float = 2.4

    def _mse_search(self, x) -> Tuple[jax.Array, jax.Array]:
        per_channel = self.ch_axis != -1
        y = _flatten_ch(x, self.ch_axis) if per_channel else x.reshape(1, -1)
        xmin = jnp.min(y, axis=1)
        xmax = jnp.max(y, axis=1)
        n_steps = int(self.maxshrink * self.grid)

        def err_for(mn, mx):
            scale, zero = calculate_qparams(mn, mx, self.bit, self.symmetric)
            qmin, qmax = quant_range(self.bit, self.symmetric)
            q = jnp.clip(
                jnp.round(y / scale[:, None]) + zero[:, None], qmin, qmax
            )
            deq = (q - zero[:, None]) * scale[:, None]
            return jnp.sum(jnp.abs(deq - y) ** self.norm_p, axis=1)

        def step(carry, i):
            best_err, best_min, best_max = carry
            p = 1.0 - i.astype(jnp.float32) / self.grid
            mn, mx = p * xmin, p * xmax
            err = err_for(mn, mx)
            better = err < best_err
            return (
                jnp.where(better, err, best_err),
                jnp.where(better, mn, best_min),
                jnp.where(better, mx, best_max),
            ), None

        init = (jnp.full(y.shape[0], jnp.inf), xmin, xmax)
        (err, mn, mx), _ = jax.lax.scan(step, init, jnp.arange(n_steps))
        if not per_channel:
            return mn[0], mx[0]
        return mn, mx

    def _batch_range(self, x):
        return self._mse_search(x)


@dataclasses.dataclass
class AvgMSEObserver(MSEObserver):
    """observer.py:522-556: running mean of per-batch MSE-searched ranges."""

    def _combine(self, cur_min, cur_max):
        if self.min_val is None:
            return cur_min, cur_max
        c = self._count
        return (
            (self.min_val * c + cur_min) / (c + 1),
            (self.max_val * c + cur_max) / (c + 1),
        )


@dataclasses.dataclass
class MSEFastObserver(RangeObserver):
    """observer.py:559-699: golden-section search on a symmetric clip bound —
    same objective as MSEObserver, O(log) probes instead of a full grid."""

    iters: int = 20
    norm_p: float = 2.4

    def _loss(self, y, bound):
        scale, zero = calculate_qparams(
            -bound, bound, self.bit, self.symmetric
        )
        qmin, qmax = quant_range(self.bit, self.symmetric)
        q = jnp.clip(jnp.round(y / scale) + zero, qmin, qmax)
        deq = (q - zero) * scale
        return jnp.sum(jnp.abs(deq - y) ** self.norm_p)

    def _batch_range(self, x):
        assert self.ch_axis == -1, "fast search is per-tensor"
        y = x.reshape(-1)
        hi = jnp.maximum(jnp.max(jnp.abs(y)), _EPS)
        lo = hi * 0.1
        gr = 0.6180339887498949

        def step(carry, _):
            a, b = carry
            c = b - gr * (b - a)
            d = a + gr * (b - a)
            fc = self._loss(y, c)
            fd = self._loss(y, d)
            a, b = jax.lax.cond(
                fc < fd, lambda: (a, d), lambda: (c, b)
            )
            return (a, b), None

        (a, b), _ = jax.lax.scan(step, (lo, hi), None, length=self.iters)
        bound = (a + b) / 2
        return -bound, bound


OBSERVERS = {
    "minmax": RangeObserver,
    "ema_minmax": EMAMinMaxObserver,
    "avg_minmax": AvgMinMaxObserver,
    "quantile": QuantileObserver,
    "avg_token_quantile": AvgTokenQuantileObserver,
    "mse": MSEObserver,
    "avg_mse": AvgMSEObserver,
    "mse_fast": MSEFastObserver,
}


def make_observer(name: str, **kw) -> RangeObserver:
    return OBSERVERS[name](**kw)


@dataclasses.dataclass
class LSQPlusObserver(RangeObserver):
    """observer.py:183-209: LSQ+-style init — range = mean ± 3·std (weights
    only; symmetric)."""

    def _batch_range(self, x):
        if self.ch_axis == -1:
            m, s = jnp.mean(x), jnp.std(x)
        else:
            y = _flatten_ch(x, self.ch_axis)
            m, s = jnp.mean(y, axis=1), jnp.std(y, axis=1)
        return m - 3 * s, m + 3 * s


@dataclasses.dataclass
class EMAQuantileObserver(RangeObserver):
    """observer.py:308-360: histogram-based |x| quantile clip, EMA-combined
    across batches (per-tensor only)."""

    ema_ratio: float = 0.9
    threshold: float = 0.9999
    bins: int = 2048

    def _batch_range(self, x):
        assert self.ch_axis == -1
        flat = x.reshape(-1)
        mn, mx = jnp.min(flat), jnp.max(flat)
        hist_max = jnp.maximum(-mn, mx)
        absx = jnp.abs(flat)
        hist, _ = jnp.histogram(absx, bins=self.bins, range=(0.0, hist_max))
        cum = jnp.cumsum(hist)
        # first bin where the cumulative count crosses threshold·numel
        idx = jnp.argmax(cum >= self.threshold * flat.size)
        crossed = cum[-1] >= self.threshold * flat.size
        clip = jnp.where(
            crossed, (idx + 0.5) * (hist_max / self.bins), hist_max
        )
        return jnp.maximum(mn, -clip), jnp.minimum(mx, clip)

    def _combine(self, cur_min, cur_max):
        if self.min_val is None:
            return cur_min, cur_max
        r = self.ema_ratio
        return (
            self.min_val * r + cur_min * (1 - r),
            self.max_val * r + cur_max * (1 - r),
        )


OBSERVERS["lsq_plus"] = LSQPlusObserver
OBSERVERS["ema_quantile"] = EMAQuantileObserver
