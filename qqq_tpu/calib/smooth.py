"""Adaptive smoothing: activation-outlier migration into weights.

Re-implements the reference smooth subsystem (QQQ/smooth/) functionally:
instead of mirrored HF model classes with ``cac_migrate`` branches inside
``forward`` (smooth/models/llama.py:182-219, 283-303, 62-113), we walk the
model layer-by-layer, run each sub-block's migration search, apply the scale,
and continue with smoothed values — the exact dataflow of the reference's
single calibration batch (smooth.py:75-78 runs ONE batch with migration on).

Three searchers (migration_llama.py:240-398), all vectorized over the
candidate grid with ``lax.map`` instead of Python loops:

* ``os+``  — Outlier Suppression+ 1-D range search: sweep symmetric clip
  thresholds, convert to per-channel scale ``max(cmx/t, cmn/-t, 1)``, pick
  min L2 error of the *quantized* sub-block output vs the FP output.
* ``awq``  — AWQ ratio grid: ``s = mean|x|^r`` normalized, r ∈ {0..0.95}.
* ``sq``   — SmoothQuant closed form ``act^α / w^(1-α)``, no search.

Sub-block outputs replayed under quantization (migration_llama.py:173-232):
``qkv`` = full attention (RoPE+softmax+PV), ``o_proj``/``down_proj`` =
plain matmul, ``up_and_gate`` = SwiGLU.

Folding (export.py:8-103): ``ln /= s``; ``qkv *= s``; for MHA (not GQA)
``o *= s / v ∕= s``; ``gate,up *= s``; ``down *= s / up ∕= s``.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from qqq_tpu.core.quant import (
    QuantSpec,
    fake_quantize_weight,
    quantize_activations_per_token,
)
from qqq_tpu.models.config import ModelConfig
from qqq_tpu.models import llama as M


#: observers usable as per-token activation range estimators (ch_axis=0 in
#: the reference's TokenFixedFakeQuantize; the others assert per-tensor)
TOKEN_OBSERVERS = ("minmax", "quantile", "lsq_plus", "mse")

#: the reference's activation fake-quantizer menu (fake_quant.py:59-195):
#:   token       TokenFixedFakeQuantize  — dynamic per-token (default)
#:   tensor      FixedFakeQuantize       — one scale for the whole tensor
#:   group       GroupFixedFakeQuantize  — per (token, channel-group) row
#:   token_group TokenGroupFixedFakeQuantize — per channel-group, shared
#:                                         across tokens (X.t()-major rows)
A_QUANTIZERS = ("token", "tensor", "group", "token_group")

A_QUANTIZER_REFERENCE_NAMES = {
    "TokenFixedFakeQuantize": "token",
    "FixedFakeQuantize": "tensor",
    "GroupFixedFakeQuantize": "group",
    "TokenGroupFixedFakeQuantize": "token_group",
}


def _fake_quant_act_grouped(
    x: jax.Array, quantizer: str, group_size: int
) -> jax.Array:
    """GroupFixedFakeQuantize / TokenGroupFixedFakeQuantize /
    FixedFakeQuantize (fake_quant.py:59-165), observer convention
    (symmetric ±127, MinMaxObserver rows)."""
    from qqq_tpu.calib.observers import fake_quant

    C = x.shape[-1]
    xf = x.reshape(-1, C).astype(jnp.float32)
    if quantizer == "tensor":
        absmax = jnp.max(jnp.abs(xf))
        s = jnp.maximum(absmax / 127.0, 1.1920929e-07)
        return fake_quant(xf, s, 0.0, 8, True).reshape(x.shape).astype(x.dtype)
    assert C % group_size == 0, (C, group_size)
    if quantizer == "group":
        # rows = every (token, channel-group) pair (fake_quant.py:115-117)
        y = xf.reshape(-1, group_size)
    else:  # token_group: rows = channel groups over all tokens (:146-148)
        y = xf.T.reshape(C // group_size, -1)
    absmax = jnp.max(jnp.abs(y), axis=1, keepdims=True)
    s = jnp.maximum(absmax / 127.0, 1.1920929e-07)
    deq = fake_quant(y, s, 0.0, 8, True)
    if quantizer == "group":
        out = deq.reshape(-1, C)
    else:
        out = deq.reshape(C, -1).T
    return out.reshape(x.shape).astype(x.dtype)


def _fake_quant_act_observed(
    x: jax.Array, observer: str, percentile: Optional[float]
) -> jax.Array:
    """Per-token fake quant with a selectable range estimator — the
    reference's TokenFixedFakeQuantize + ``--a_observer`` path
    (fake_quant.py:168-195, quant_model.py:26-60).  Observer runs with
    tokens on the channel axis, exactly like the reference's ch_axis=0."""
    from qqq_tpu.calib.observers import fake_quant, make_observer

    if observer not in TOKEN_OBSERVERS:
        raise ValueError(
            f"a_observer {observer!r} is per-tensor only; per-token "
            f"activation quant supports {TOKEN_OBSERVERS}"
        )
    kw = {}
    if observer == "quantile" and percentile is not None:
        kw["percentile"] = percentile
    obs = make_observer(observer, bit=8, symmetric=True, ch_axis=0, **kw)
    xf = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    obs.update(xf)
    scale, zero = obs.qparams()
    out = fake_quant(xf, scale[:, None], zero[:, None], 8, True)
    return out.reshape(x.shape).astype(x.dtype)


def _fake_quant_act(
    x: jax.Array,
    percentile: Optional[float] = None,
    convention: str = "observer",
    observer: str = "minmax",
) -> jax.Array:
    """Dynamic per-token symmetric INT8 fake quant (the default activation
    quantizer, TokenFixedFakeQuantize, fake_quant.py:168-195).

    ``convention="observer"`` (default) reproduces the reference's
    calibration-time quantizer exactly: per-token symmetric with
    quant range ±127 (ObserverBase quant_min = -(2^(b-1)) **+1**,
    observer.py:36-42), scale = absmax/127 clamped at float eps.
    ``convention="kernel"`` is the deployed kernel's dynamic quant
    (absmax/127, clamp [-128, 127], tiny-clamp instead of eps,
    qlinear_marlin.py:265-268) — numerically identical except for the
    all-zero-row guard.

    ``observer`` selects the per-token range estimator (reference
    ``--a_observer``); with ``percentile`` set, quantile token-pruning applies
    (QuantileObserver semantics, observer.py:153-180).
    """
    if observer != "minmax":
        return _fake_quant_act_observed(x, observer, percentile)
    if percentile is not None:
        from qqq_tpu.calib.clipping import fake_quant_act_percentile

        return fake_quant_act_percentile(x, jnp.float32(percentile))
    if convention == "kernel":
        q, s = quantize_activations_per_token(x.reshape(-1, x.shape[-1]))
        return (q.astype(jnp.float32) * s).reshape(x.shape).astype(x.dtype)
    xf = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s = jnp.maximum(absmax / 127.0, 1.1920929e-07)
    q = jnp.clip(jnp.round(xf / s), -127, 127)
    return (q * s).reshape(x.shape).astype(x.dtype)


#: observers usable as per-(out-channel|group-row) weight range estimators
WEIGHT_OBSERVERS = ("minmax", "lsq_plus", "mse")


def _fake_quant_weight_observer(
    w: jax.Array, w_spec: QuantSpec, observer: str = "minmax"
) -> jax.Array:
    """Weight fake quant in the reference's *observer* convention
    (migrator.quantize, migration_llama.py:100-126): symmetric, quant range
    ±(2^(b-1)-1) = ±7 (observer.py:36-42); per out-channel, or per
    (out, group) row for GroupFixedQuantize.  Note this differs from the
    GPTQ-stage per-group convention ([0,15] affine, gptq/quant.py:85-88) —
    the reference itself uses both, per stage.  ``observer`` selects the
    range estimator (reference ``--w_observer``)."""
    K, N = w.shape
    maxq = 2 ** (w_spec.bits - 1) - 1
    if w_spec.per_channel:
        y = w.astype(jnp.float32).T  # (N, K): reference row = out channel
    else:
        g = w_spec.group_size
        # reference reshapes the (N, K) weight to (-1, group_size): each row
        # is one contiguous K-group of one output channel
        y = w.astype(jnp.float32).T.reshape(-1, g)
    if observer == "minmax":
        absmax = jnp.max(jnp.abs(y), axis=1, keepdims=True)
        s = jnp.maximum(absmax / maxq, 1.1920929e-07)
        deq = jnp.clip(jnp.round(y / s), -maxq, maxq) * s
    else:
        from qqq_tpu.calib.observers import fake_quant, make_observer

        if observer not in WEIGHT_OBSERVERS:
            raise ValueError(
                f"w_observer {observer!r} unsupported; pick one of "
                f"{WEIGHT_OBSERVERS}"
            )
        obs = make_observer(
            observer, bit=w_spec.bits, symmetric=True, ch_axis=0
        )
        obs.update(y)
        scale, zero = obs.qparams()
        deq = fake_quant(y, scale[:, None], zero[:, None], w_spec.bits, True)
    if w_spec.per_channel:
        return deq.T.astype(w.dtype)
    return deq.reshape(N, K).T.astype(w.dtype)


def _sub_block_output(
    module_type: str,
    x: jax.Array,  # (B, T, C) input to the linear(s)
    w: jax.Array,  # (C, N) concatenated weights (our in×out layout)
    extra: Dict[str, Any],
) -> jax.Array:
    """FP sub-block replay (migration_llama.py:173-232)."""
    if module_type in ("o_proj", "down_proj"):
        return jnp.einsum("btc,cn->btn", x, w)
    if module_type == "up_and_gate":
        out = jnp.einsum("btc,cn->btn", x, w)
        gate, up = jnp.split(out, 2, axis=-1)
        return jax.nn.silu(gate) * up
    if module_type == "qkv":
        cfg: ModelConfig = extra["config"]
        B, T, C = x.shape
        nh, nkv, hd = (
            cfg.num_attention_heads,
            cfg.num_key_value_heads,
            cfg.head_dim,
        )
        qkv = jnp.einsum("btc,cn->btn", x, w)
        q = qkv[..., : nh * hd].reshape(B, T, nh, hd)
        k = qkv[..., nh * hd : nh * hd + nkv * hd].reshape(B, T, nkv, hd)
        v = qkv[..., nh * hd + nkv * hd :].reshape(B, T, nkv, hd)
        if extra.get("qkv_bias") is not None:
            bq, bk, bv = extra["qkv_bias"]
            q = q + bq.reshape(1, 1, nh, hd)
            k = k + bk.reshape(1, 1, nkv, hd)
            v = v + bv.reshape(1, 1, nkv, hd)
        q, k = M.apply_rope(q, k, extra["positions"], extra["inv_freq"])
        kf = M.repeat_kv(k, cfg.num_kv_groups)
        vf = M.repeat_kv(v, cfg.num_kv_groups)
        mask = (
            extra["positions"][:, None, :] <= extra["positions"][:, :, None]
        )
        return M._attention_scores(q, kf, vf, mask).reshape(B, T, nh * hd)
    raise ValueError(module_type)


def _quantized_output(
    module_type: str,
    x: jax.Array,
    w: jax.Array,
    w_spec: QuantSpec,
    extra: Dict[str, Any],
) -> jax.Array:
    convention = extra.get("convention", "observer")
    a_quantizer = extra.get("a_quantizer", "token")
    if a_quantizer != "token":
        xq = _fake_quant_act_grouped(
            x, a_quantizer, extra.get("a_group_size", 128)
        )
    else:
        xq = _fake_quant_act(
            x, extra.get("a_percentile"), convention,
            extra.get("a_observer", "minmax"),
        )
    if convention == "observer":
        wq = _fake_quant_weight_observer(
            w, w_spec, extra.get("w_observer", "minmax")
        )
    else:
        wq = fake_quantize_weight(w, w_spec).astype(w.dtype)
    return _sub_block_output(module_type, xq, wq, extra)


def _loss(pred: jax.Array, tgt: jax.Array, p: float = 2.0) -> jax.Array:
    """migration_llama.py:163-164."""
    return jnp.mean(
        jnp.sum(jnp.abs(pred.astype(jnp.float32) - tgt) ** p, axis=-1)
    )


def _cac_scale(cmx, cmn, threshold) -> jax.Array:
    """migration_llama.py:131-143: per-channel scale from a symmetric clip
    threshold."""
    mx = jnp.where(cmx > threshold, cmx / threshold, 1.0)
    mn = jnp.where(cmn < -threshold, cmn / -threshold, 1.0)
    return jnp.maximum(mx, mn)


def migrate(
    module_type: str,
    x: jax.Array,
    w: jax.Array,
    extra: Dict[str, Any],
    *,
    method: str = "os+",
    w_spec: QuantSpec = QuantSpec(bits=4, group_size=-1),
    n_grid: Optional[int] = None,
    smooth_alpha: float = 0.5,
) -> jax.Array:
    """Search the per-channel migration scale for one sub-block.

    Returns s (C,) fp32 with x/s, w·s the smoothed pair.
    """
    x = x.astype(jnp.float32)
    w = w.astype(jnp.float32)
    cmx = jnp.max(x, axis=(0, 1))
    cmn = jnp.min(x, axis=(0, 1))
    fp_out = _sub_block_output(module_type, x, w, extra).astype(jnp.float32)

    if method == "sq":  # migration_llama.py:357-398
        act_scales = jnp.maximum(jnp.abs(cmx), jnp.abs(cmn))
        w_scales = jnp.clip(jnp.max(jnp.abs(w), axis=1), 1e-5, None)
        s = jnp.clip(
            act_scales**smooth_alpha / w_scales ** (1 - smooth_alpha),
            1e-5,
            None,
        )
        return s

    if method == "awq":  # migration_llama.py:285-354
        n = n_grid or 20
        # reference: x_max = mean|x|; clamp(min=1e-4) applied AFTER pow(ratio)
        x_max = jnp.mean(jnp.abs(x.reshape(-1, x.shape[-1])), axis=0)

        def eval_ratio(r):
            s = jnp.clip(x_max**r, 1e-4, None)
            s = s / jnp.sqrt(s.max() * s.min())
            out = _quantized_output(
                module_type, x / s, w * s[:, None], w_spec, extra
            )
            return _loss(out, fp_out)

        ratios = jnp.arange(n, dtype=jnp.float32) / n
        losses = jax.lax.map(eval_ratio, ratios)
        best = ratios[jnp.argmin(losses)]
        s = jnp.clip(x_max**best, 1e-4, None)
        return s / jnp.sqrt(s.max() * s.min())

    if method == "os+":  # Migrator1DRangeSearch, migration_llama.py:240-282
        amx = float(jnp.maximum(jnp.max(x), 0.0))
        amn = float(jnp.minimum(jnp.min(x), 0.0))
        bound = max(-amn, amx)
        # exact reference candidate walk (search_migrate_range_1D): st from
        # bound down by step while st >= 0.1, num = max(100, int(amx/0.5))
        lo = 0.1
        num = n_grid or max(100, int(amx / 0.5))
        step = (bound - lo) / num
        ts = []
        st = bound
        while st >= lo:
            ts.append(st)
            st -= step
        if not ts:  # degenerate tiny activations: bound <= 0.1
            ts = [max(bound, lo)]
        thresholds = jnp.asarray(ts, jnp.float32)

        def eval_threshold(t):
            s = _cac_scale(cmx, cmn, t)
            out = _quantized_output(
                module_type, x / s, w * s[:, None], w_spec, extra
            )
            return _loss(out, fp_out)

        losses = jax.lax.map(eval_threshold, thresholds)
        best_t = thresholds[jnp.argmin(losses)]
        return _cac_scale(cmx, cmn, best_t)

    raise ValueError(f"unknown smooth method {method!r}")


# ---------------------------------------------------------------------------
# whole-model smoothing pass


def smooth_model(
    params: Dict[str, Any],
    config: ModelConfig,
    calib_tokens: jax.Array,  # (B, T) one calibration batch (smooth.py:75-78)
    *,
    method: str = "os+",
    w_spec: QuantSpec = QuantSpec(bits=4, group_size=-1),
    n_grid: Optional[int] = None,
    a_percentile: Optional[float] = None,
    a_observer: str = "minmax",
    w_observer: str = "minmax",
    a_quantizer: str = "token",
    a_group_size: int = 128,
) -> List[jax.Array]:
    """Run the migration searches through the model, returning scale_list
    in the reference's order: [qkv, o, gate_up, down] × layers
    (migration_llama.py:13, export.py:8-48).

    ``a_observer``/``w_observer`` select the activation/weight range
    estimators used in the quantized replays (reference ``--a_observer`` /
    ``--w_observer``, quant_model.py:26-117)."""
    B, T = calib_tokens.shape
    inv_freq = M.rope_inv_freq(config)
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
    x = params["embed"][calib_tokens].astype(jnp.float32)

    scale_list: List[jax.Array] = []

    for layer in params["layers"]:
        extra = {
            "config": config,
            "positions": positions,
            "inv_freq": inv_freq,
            "a_percentile": a_percentile,
            "a_observer": a_observer,
            "w_observer": w_observer,
            "a_quantizer": a_quantizer,
            "a_group_size": a_group_size,
        }
        # ---- attention: qkv migration on the post-ln input
        h = M.rms_norm(x, layer["input_layernorm"], config.rms_norm_eps)
        w_qkv = jnp.concatenate(
            [
                layer["q_proj"]["w"].astype(jnp.float32),
                layer["k_proj"]["w"].astype(jnp.float32),
                layer["v_proj"]["w"].astype(jnp.float32),
            ],
            axis=1,
        )
        if "b" in layer["q_proj"]:
            extra["qkv_bias"] = (
                layer["q_proj"]["b"],
                layer["k_proj"]["b"],
                layer["v_proj"]["b"],
            )
        s_qkv = migrate(
            "qkv", h, w_qkv, extra, method=method, w_spec=w_spec, n_grid=n_grid
        )
        scale_list.append(s_qkv)
        h = h / s_qkv

        # recompute attention with smoothed input/weights to get o_proj input
        nh, nkv, hd = (
            config.num_attention_heads,
            config.num_key_value_heads,
            config.head_dim,
        )
        # propagate through the fake-quant path like the reference (the
        # wrapped model runs with calibration quantization enabled,
        # state.py:8-19), so downstream searches see quantized upstream
        attn = _quantized_output(
            "qkv", h, w_qkv * s_qkv[:, None], w_spec, extra
        )

        # ---- o_proj migration — searched for MHA AND GQA (the reference's
        # mirrors migrate unconditionally, smooth/models/llama.py &
        # qwen2.py:305-327, and the in-model replay divides attn by it, so
        # downstream searches see its quantization error); only the export
        # FOLD is MHA-gated (export.py:27-31)
        w_o = layer["o_proj"]["w"].astype(jnp.float32)
        s_o = migrate(
            "o_proj", attn, w_o, extra, method=method, w_spec=w_spec,
            n_grid=n_grid,
        )
        scale_list.append(s_o)
        x = x + _quantized_output(
            "o_proj", attn / s_o, w_o * s_o[:, None], w_spec, extra
        )

        # ---- MLP: gate/up migration
        h2 = M.rms_norm(
            x, layer["post_attention_layernorm"], config.rms_norm_eps
        )
        w_gu = jnp.concatenate(
            [
                layer["gate_proj"]["w"].astype(jnp.float32),
                layer["up_proj"]["w"].astype(jnp.float32),
            ],
            axis=1,
        )
        s_gu = migrate(
            "up_and_gate", h2, w_gu, extra, method=method, w_spec=w_spec,
            n_grid=n_grid,
        )
        scale_list.append(s_gu)
        h2 = h2 / s_gu
        swiglu = _quantized_output(
            "up_and_gate", h2, w_gu * s_gu[:, None], w_spec, extra
        )

        # ---- down_proj migration
        w_d = layer["down_proj"]["w"].astype(jnp.float32)
        s_d = migrate(
            "down_proj", swiglu, w_d, extra, method=method, w_spec=w_spec,
            n_grid=n_grid,
        )
        scale_list.append(s_d)
        x = x + _quantized_output(
            "down_proj", swiglu / s_d, w_d * s_d[:, None], w_spec, extra
        )

    return scale_list


def export_smoothed_model(
    params: Dict[str, Any], config: ModelConfig, scale_list: List[jax.Array]
) -> Dict[str, Any]:
    """Fold scale_list permanently into LN/linear weights (export.py:8-103)."""
    mha = config.num_attention_heads == config.num_key_value_heads
    params = dict(params)
    new_layers = []
    it = iter(scale_list)

    def scale_in(lin, s):  # weight input-dim multiply
        nl = dict(lin)
        nl["w"] = (lin["w"].astype(jnp.float32) * s[:, None]).astype(
            lin["w"].dtype
        )
        return nl

    def scale_out(lin, s, divide=True):  # weight output-dim divide
        nl = dict(lin)
        w = lin["w"].astype(jnp.float32)
        nl["w"] = (w / s[None, :] if divide else w * s[None, :]).astype(
            lin["w"].dtype
        )
        if "b" in lin:
            b = lin["b"].astype(jnp.float32)
            nl["b"] = (b / s if divide else b * s).astype(lin["b"].dtype)
        return nl

    for layer in params["layers"]:
        layer = dict(layer)
        s_qkv = next(it)
        layer["input_layernorm"] = (
            layer["input_layernorm"].astype(jnp.float32) / s_qkv
        ).astype(layer["input_layernorm"].dtype)
        for name in ("q_proj", "k_proj", "v_proj"):
            layer[name] = scale_in(layer[name], s_qkv)

        s_o = next(it)
        if mha:
            layer["o_proj"] = scale_in(layer["o_proj"], s_o)
            layer["v_proj"] = scale_out(layer["v_proj"], s_o)  # v /= s + bias

        s_gu = next(it)
        layer["post_attention_layernorm"] = (
            layer["post_attention_layernorm"].astype(jnp.float32) / s_gu
        ).astype(layer["post_attention_layernorm"].dtype)
        layer["gate_proj"] = scale_in(layer["gate_proj"], s_gu)
        layer["up_proj"] = scale_in(layer["up_proj"], s_gu)

        s_d = next(it)
        layer["down_proj"] = scale_in(layer["down_proj"], s_d)
        layer["up_proj"] = scale_out(layer["up_proj"], s_d)
        new_layers.append(layer)

    params["layers"] = new_layers
    return params
