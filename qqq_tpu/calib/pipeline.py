"""Layer-sequential GPTQ quantization pipeline.

The TPU counterpart of the reference driver (QQQ/gptq/models/llama.py:27-162
+ apply_gptq.py:19-125).  Because the model is a functional pytree — not
module objects — there are no forward hooks: a capture forward returns every
linear's input directly.  Per decoder layer:

1. replay the calibration samples through the (still unquantized) layer,
   accumulating one Hessian per linear-input group — q/k/v share the
   post-input-layernorm input, gate/up share the post-attn-layernorm input
   (reference collects these per-module; the shared-input structure makes
   them identical);
2. GPTQ-quantize all 7 linears (q,k,v,o,gate,up,down — find_layers picks up
   exactly these, model_utils.py:79-89);
3. replace weights and replay again to produce the next layer's inputs from
   the *quantized* layer (reference: second replay loop, models/llama.py:
   141-148).

Embeddings and lm_head stay FP (models/llama.py:306).
"""

from __future__ import annotations

import functools
import time
import logging
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from qqq_tpu.core.quant import QuantSpec
from qqq_tpu.core.packing import pack_int4
from qqq_tpu.calib.gptq import (
    GPTQResult,
    gptq_quantize_matrix,
    hessian_init,
    hessian_update,
)
from qqq_tpu.models.config import ModelConfig
from qqq_tpu.models import llama as M

logger = logging.getLogger("qqq_tpu")

_QKV = ("q_proj", "k_proj", "v_proj")
_GUP = ("gate_proj", "up_proj")


def layer_capture_forward(
    layer: Dict[str, Any],
    x: jax.Array,  # (B, T, H)
    positions: jax.Array,
    inv_freq: jax.Array,
    config: ModelConfig,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Decoder-layer forward that also returns each linear's input —
    functional replacement for the reference's forward hooks."""
    B, T, H = x.shape
    nh, nkv, hd = (
        config.num_attention_heads,
        config.num_key_value_heads,
        config.head_dim,
    )
    h = M.rms_norm(x, layer["input_layernorm"], config.rms_norm_eps)
    qkv_in = h
    q = M.linear_apply(layer["q_proj"], h).reshape(B, T, nh, hd)
    k = M.linear_apply(layer["k_proj"], h).reshape(B, T, nkv, hd)
    v = M.linear_apply(layer["v_proj"], h).reshape(B, T, nkv, hd)
    q, k = M.apply_rope(q, k, positions, inv_freq)
    mask = positions[:, None, :] <= positions[:, :, None]
    kf = M.repeat_kv(k, config.num_kv_groups)
    vf = M.repeat_kv(v, config.num_kv_groups)
    attn = M._attention_scores(q, kf, vf, mask).reshape(B, T, nh * hd)
    o_in = attn
    x = x + M.linear_apply(layer["o_proj"], attn)

    h2 = M.rms_norm(x, layer["post_attention_layernorm"], config.rms_norm_eps)
    gup_in = h2
    gate = M.linear_apply(layer["gate_proj"], h2)
    up = M.linear_apply(layer["up_proj"], h2)
    swiglu = jax.nn.silu(gate) * up
    down_in = swiglu
    x = x + M.linear_apply(layer["down_proj"], swiglu)
    return x, {"qkv": qkv_in, "o": o_in, "gup": gup_in, "down": down_in}


@functools.partial(jax.jit, static_argnames=("config",))
def _hessian_step(layer, x, positions, inv_freq, config, Hs, ns):
    """One calibration sample: returns updated Hessian dict (keys qkv/o/gup/
    down) and counts."""
    _, captures = layer_capture_forward(layer, x, positions, inv_freq, config)
    new_Hs, new_ns = {}, {}
    for key in Hs:
        new_Hs[key], new_ns[key] = hessian_update(
            Hs[key], ns[key], captures[key]
        )
    return new_Hs, new_ns


@functools.partial(jax.jit, static_argnames=("config",))
def _layer_forward(layer, x, positions, inv_freq, config):
    out, _ = M.decoder_layer(layer, x, positions, inv_freq, config)
    return out


def quantize_result_to_linear(
    res: GPTQResult, spec: QuantSpec, bias: Optional[jax.Array]
) -> Dict[str, Any]:
    """GPTQ output → packed inference linear params (the analogue of
    QuantLinear.pack, qlinear_marlin.py:181-262, in the TPU layout)."""
    p: Dict[str, Any] = {"w_packed": pack_int4(res.q4)}
    if spec.per_channel:
        p["s_channel"] = res.scale[0].astype(jnp.float32)
    else:
        # bf16 storage — the TPU analogue of the reference's fp16 s_group
        # buffer (qlinear_marlin.py:110-122); halves the scale HBM stream at
        # decode.  apply_gptq rounds scales to bf16 BEFORE code selection,
        # so this cast is lossless for pipeline-produced results.
        p["s_group"] = res.scale.astype(jnp.bfloat16)
    if bias is not None:
        p["b"] = bias
    return p


def save_quantizers(path: str, records: Dict[str, Any]) -> None:
    """Persist the per-linear GPTQ results (q4 codes + scales + losses) —
    the quantizers.pth analogue (reference apply_gptq.py:34), but
    self-contained: packing can resume from this file alone."""
    import numpy as np

    np.savez(path, **records)
    logger.info("saved GPTQ intermediate to %s", path)


def pack_from_quantizers(
    params: Dict[str, Any],
    config: ModelConfig,
    spec: QuantSpec,
    quantizers_path: str,
) -> Dict[str, Any]:
    """Rebuild the packed checkpoint from a saved quantizers.npz without
    re-running GPTQ (resume after a crash between GPTQ and pack)."""
    import numpy as np

    z = np.load(quantizers_path)
    out = dict(params)
    new_layers = []
    for li, layer in enumerate(params["layers"]):
        new_layer = dict(layer)
        for name in (*_QKV, "o_proj", *_GUP, "down_proj"):
            pre = f"layers.{li}.{name}"
            res = GPTQResult(
                w_deq=jnp.zeros((1, 1)),  # unused by packing
                q4=jnp.asarray(z[f"{pre}.q4"]),
                scale=jnp.asarray(z[f"{pre}.scale"]),
                zero=jnp.asarray(z[f"{pre}.zero"]),
                loss=jnp.float32(z[f"{pre}.loss"]),
            )
            new_layer[name] = quantize_result_to_linear(
                res, spec, layer[name].get("b")
            )
        new_layers.append(new_layer)
    out["layers"] = new_layers
    if "lm_head.q4" in z.files and params.get("lm_head") is not None:
        res = GPTQResult(
            w_deq=jnp.zeros((1, 1)),
            q4=jnp.asarray(z["lm_head.q4"]),
            scale=jnp.asarray(z["lm_head.scale"]),
            zero=jnp.asarray(z["lm_head.zero"]),
            loss=jnp.float32(z["lm_head.loss"]),
        )
        out["lm_head"] = quantize_result_to_linear(
            res, spec, params["lm_head"].get("b")
        )
    return out


def apply_gptq(
    params: Dict[str, Any],
    config: ModelConfig,
    calib_tokens: jax.Array,  # (nsamples, seqlen) int32
    spec: QuantSpec,
    *,
    percdamp: float = 0.01,
    actorder: bool = True,
    blocksize: int = 128,
    sample_batch: int = 4,
    pack: bool = True,
    dtype=jnp.bfloat16,
    stream_from_host: bool = False,
    quantize_lm_head: bool = False,
    quantizers_path: Optional[str] = None,
    scale_store_dtype=jnp.bfloat16,  # per-group scale storage rounding
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Quantize all decoder-layer linears of ``params`` in place (functionally).

    Returns (new_params, stats).  With ``pack=True`` linears become packed
    W4A8 params; otherwise they keep dense fake-quantized weights (useful for
    debugging/eval of the quantization alone).

    ``stream_from_host=True`` supports models whose dense weights exceed HBM
    (a 7B bf16 model alone fills a 16 GB chip): ``params`` leaves live on
    host (numpy / CPU arrays), each decoder layer is device_put for its
    Hessian+GPTQ turn and dropped after; only the packed result (~¼ the
    dense bytes) and the hidden states stay resident.  (The reference's
    analogue is accelerate CPU offload, model_utils.py:55-76.)
    """
    n, T = calib_tokens.shape
    inv_freq = M.rope_inv_freq(config)
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None, :], (sample_batch, T))

    hidden = []
    embed = jnp.asarray(params["embed"]) if stream_from_host else params["embed"]
    for s0 in range(0, n, sample_batch):
        hidden.append(embed[calib_tokens[s0 : s0 + sample_batch]].astype(dtype))
    if stream_from_host:
        del embed

    import numpy as np

    stats: Dict[str, Any] = {"layer_losses": []}
    quantizer_records: Dict[str, Any] = {}
    new_layers = []
    for li, layer in enumerate(params["layers"]):
        t0 = time.time()
        if stream_from_host:
            layer = jax.device_put(
                jax.tree.map(jnp.asarray, layer)
            )
        Hs = {}
        ns = {}
        for key, dim in (
            ("qkv", config.hidden_size),
            ("o", config.q_dim),
            ("gup", config.hidden_size),
            ("down", config.intermediate_size),
        ):
            Hs[key], ns[key] = hessian_init(dim)
        for xb in hidden:
            Hs, ns = _hessian_step(
                layer, xb, positions[: xb.shape[0]], inv_freq, config, Hs, ns
            )

        group_of = {**{k: "qkv" for k in _QKV}, "o_proj": "o",
                    **{k: "gup" for k in _GUP}, "down_proj": "down"}
        new_layer = dict(layer)     # packed (or dense fake-quant) output
        replay_layer = dict(layer)  # always dense fake-quant, for replay
        losses = {}
        for name, hkey in group_of.items():
            lin = layer[name]
            res = gptq_quantize_matrix(
                lin["w"].astype(jnp.float32),
                Hs[hkey],
                spec,
                blocksize=blocksize,
                percdamp=percdamp,
                actorder=actorder,
                scale_store_dtype=scale_store_dtype,
            )
            losses[name] = float(res.loss)
            if quantizers_path:
                pre = f"layers.{li}.{name}"
                quantizer_records[f"{pre}.q4"] = np.asarray(res.q4)
                quantizer_records[f"{pre}.scale"] = np.asarray(res.scale)
                quantizer_records[f"{pre}.zero"] = np.asarray(res.zero)
                quantizer_records[f"{pre}.loss"] = np.float32(res.loss)
            dense = {"w": res.w_deq.astype(dtype)}
            if "b" in lin:
                dense["b"] = lin["b"]
            replay_layer[name] = dense
            new_layer[name] = (
                quantize_result_to_linear(res, spec, lin.get("b"))
                if pack
                else dense
            )

        # next layer's inputs come from the *quantized* layer (reference
        # models/llama.py:141-148), with fp activations — so replay with the
        # dense fake-quant weights, not the packed kernel (which would add
        # dynamic activation quantization the reference replay doesn't have).
        hidden = [
            _layer_forward(
                replay_layer, xb, positions[: xb.shape[0]], inv_freq, config
            )
            for xb in hidden
        ]
        stats["layer_losses"].append(losses)
        logger.info(
            "layer %d quantized in %.1fs, loss=%s", li, time.time() - t0, losses
        )
        new_layers.append(new_layer)

    out = dict(params)
    out["layers"] = new_layers

    if quantize_lm_head and params.get("lm_head") is not None:
        # beyond-reference option (the reference keeps the head FP,
        # models/llama.py:306): W4A8 head ≈ −7% decode step time at 7B.
        head = params["lm_head"]
        if stream_from_host:
            head = jax.device_put(jax.tree.map(jnp.asarray, head))
        Hh, nh_ = hessian_init(config.hidden_size)
        norm_w = jnp.asarray(params["norm"])
        for xb in hidden:
            h = M.rms_norm(xb, norm_w, config.rms_norm_eps)
            Hh, nh_ = hessian_update(Hh, nh_, h)
        res = gptq_quantize_matrix(
            head["w"].astype(jnp.float32), Hh, spec,
            blocksize=blocksize, percdamp=percdamp, actorder=actorder,
            scale_store_dtype=scale_store_dtype,
        )
        stats["lm_head_loss"] = float(res.loss)
        if quantizers_path:
            quantizer_records["lm_head.q4"] = np.asarray(res.q4)
            quantizer_records["lm_head.scale"] = np.asarray(res.scale)
            quantizer_records["lm_head.zero"] = np.asarray(res.zero)
            quantizer_records["lm_head.loss"] = np.float32(res.loss)
        out["lm_head"] = (
            quantize_result_to_linear(res, spec, head.get("b"))
            if pack
            else {"w": res.w_deq.astype(dtype)}
        )
    if quantizers_path:
        save_quantizers(quantizers_path, quantizer_records)
    return out, stats
