"""Token-wise activation clipping search.

Functional re-derivation of QQQ/smooth/quantization/token_wise_clipping.py
(which is unreachable upstream — its import path is broken,
token_wise_clipping.py:3): sweep activation-percentile ratios
``1.0 − i·step`` and keep the one minimizing the calibration LM loss with
quantization enabled (find_ratio, :40-56).

Per-token percentile quantization: each token's INT8 scale comes from the
``ratio``-quantile of |x| over channels instead of the absmax — clipping the
token's own outliers.
"""

from __future__ import annotations

import functools
import logging
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from qqq_tpu.core.quant import QuantSpec, fake_quantize_weight
from qqq_tpu.models.config import ModelConfig
from qqq_tpu.models import llama as M

logger = logging.getLogger("qqq_tpu")


def fake_quant_act_percentile(x: jax.Array, ratio: jax.Array) -> jax.Array:
    """Dynamic per-token INT8 fake quant with percentile clipping."""
    xf = x.astype(jnp.float32)
    flat = xf.reshape(-1, x.shape[-1])
    clip = jnp.quantile(jnp.abs(flat), ratio, axis=-1, keepdims=True)
    s = jnp.maximum(clip, 1e-30) / 127.0
    q = jnp.clip(jnp.round(flat / s), -128, 127)
    return (q * s).reshape(x.shape).astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("config",))
def _quantized_lm_loss(
    params: Dict[str, Any],
    config: ModelConfig,
    tokens: jax.Array,  # (B, T)
    ratio: jax.Array,
) -> jax.Array:
    """Causal-LM CE loss with every decoder linear running fake-quantized
    weights and ratio-clipped per-token INT8 activations (the quantization
    state 'enable_quantization' puts the reference model in, :20-27)."""
    w_spec = QuantSpec(bits=4, group_size=-1)
    B, T = tokens.shape
    inv_freq = M.rope_inv_freq(config)
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
    x = params["embed"][tokens].astype(jnp.float32)

    def qlin(lin, h):
        wq = fake_quantize_weight(lin["w"].astype(jnp.float32), w_spec)
        out = jnp.dot(fake_quant_act_percentile(h, ratio), wq)
        if "b" in lin:
            out = out + lin["b"].astype(out.dtype)
        return out

    nh, nkv, hd = (
        config.num_attention_heads, config.num_key_value_heads,
        config.head_dim,
    )
    mask = positions[:, None, :] <= positions[:, :, None]
    for layer in params["layers"]:
        h = M.rms_norm(x, layer["input_layernorm"], config.rms_norm_eps)
        q = qlin(layer["q_proj"], h).reshape(B, T, nh, hd)
        k = qlin(layer["k_proj"], h).reshape(B, T, nkv, hd)
        v = qlin(layer["v_proj"], h).reshape(B, T, nkv, hd)
        q, k = M.apply_rope(q, k, positions, inv_freq)
        kf = M.repeat_kv(k, config.num_kv_groups)
        vf = M.repeat_kv(v, config.num_kv_groups)
        attn = M._attention_scores(q, kf, vf, mask).reshape(B, T, nh * hd)
        x = x + qlin(layer["o_proj"], attn)
        h2 = M.rms_norm(x, layer["post_attention_layernorm"],
                        config.rms_norm_eps)
        swiglu = jax.nn.silu(qlin(layer["gate_proj"], h2)) * qlin(
            layer["up_proj"], h2
        )
        x = x + qlin(layer["down_proj"], swiglu)

    x = M.rms_norm(x, params["norm"], config.rms_norm_eps)
    if params.get("lm_head") is not None:
        logits = jnp.dot(x, params["lm_head"]["w"].astype(x.dtype))
    else:
        logits = jnp.dot(x, params["embed"].T.astype(x.dtype))
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, tokens[:, 1:, None], axis=-1)
    return jnp.mean(nll)


def token_wise_clipping_search(
    params: Dict[str, Any],
    config: ModelConfig,
    calib_tokens: jax.Array,  # (n, T)
    *,
    a_bit: int = 8,
    step: float = 0.005,
    iters: int = 10,
) -> Tuple[float, float]:
    """Returns (best_ratio, best_loss).  Reference sweeps
    iters = {8-bit: 0.05, 6-bit: 0.1}/step candidates (cac_step_iters,
    token_wise_clipping.py:62-72)."""
    best_ratio, best_loss = 1.0, None
    for i in range(iters):
        ratio = 1.0 - step * i
        loss = float(
            _quantized_lm_loss(
                params, config, calib_tokens, jnp.float32(ratio)
            )
        )
        logger.info("token clipping ratio %.4f: loss %.5f", ratio, loss)
        if best_loss is None or loss < best_loss:
            best_ratio, best_loss = ratio, loss
    return best_ratio, best_loss
