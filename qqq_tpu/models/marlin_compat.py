"""Interop with reference QQQ checkpoints (Marlin-packed format).

A user of the reference quantizes once and gets an HF checkpoint whose
QuantLinear buffers are in Marlin's CUDA fragment layout
(QQQ/gptq/qlinear/qlinear_marlin.py:97-133, pack :181-262):

* ``B``  int32 (K/16, N·16/8): weights in 16×16 tiles, a `ldmatrix`-oriented
  intra-tile permutation, 8 nibbles per int32;
* ``s_channel`` fp32 (1, N): per-channel scales — per-channel checkpoints
  store ``scale/16`` (the CUDA high-nibble trick, :221-226), per-group store
  ``s_extra``;
* ``s_group`` fp16 (K/128, N): double scales ``scale/s_extra`` (per-group
  only), both scale tensors in Marlin scale permutations.

This module inverts all of that on host (NumPy) and repacks into our TPU
nibble-plane layout (core/packing.py), so reference-quantized models load
directly.  The permutations are re-derived from the layout definition at
qlinear_marlin.py:147-176.
"""

from __future__ import annotations

import functools
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _marlin_perms(per_channel: bool):
    """The Marlin packing permutations (qlinear_marlin.py:147-176).

    Returns (perm (1024,), scale_perm (64,), scale_perm_single (32,)).
    """
    perm = []
    for i in range(32):
        perm1 = []
        col = i // 4
        for block in (0, 1):
            for row in (
                4 * (i % 4),
                4 * (i % 4) + 1,
                4 * (i % 4) + 2,
                4 * (i % 4) + 3,
            ):
                perm1.append(16 * row + col + 8 * block)
        for j in range(4):
            perm.extend(p + 256 * j for p in perm1)
    perm = np.array(perm)
    interleave = (
        np.array([4, 0, 5, 1, 6, 2, 7, 3])
        if per_channel
        else np.array([0, 2, 4, 6, 1, 3, 5, 7])
    )
    perm = perm.reshape(-1, 8)[:, interleave].ravel()
    scale_perm = np.array(
        [i + 8 * j for i in range(8) for j in range(8)]
    )
    scale_perm_single = np.array(
        [2 * i + j for i in range(4) for j in (0, 1, 8, 9, 16, 17, 24, 25)]
    )
    return perm, scale_perm, scale_perm_single


def unpack_marlin(
    B: np.ndarray,            # (K/16, N·16/8) int32
    s_channel: np.ndarray,    # (1, N) fp32
    s_group: Optional[np.ndarray],  # (K/128, N) fp16 or None/empty
    *,
    infeatures: int,
    outfeatures: int,
) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
    """Invert QuantLinear.pack → (q4 signed codes (K, N) int8,
    s_channel (N,) fp32, s_group_full (K/128, N) fp32 or None).

    Per-group returns the *full* group scale ``s_group · s_extra`` — our
    kernel applies group scales to exact int32 group dots (see
    kernels/w4a8_gemm.py) instead of the reference's double-scale requant.
    """
    K, N = infeatures, outfeatures
    per_channel = s_group is None or s_group.size == 0
    perm, scale_perm, scale_perm_single = _marlin_perms(per_channel)

    # 1. nibbles out of int32 words: res[:, i::8] held nibble i
    Bu = B.astype(np.uint32)
    res = np.zeros((K // 16, N * 16), dtype=np.uint32)
    for i in range(8):
        res[:, i::8] = (Bu >> (4 * i)) & 0xF

    # 2. invert the fragment permutation (pack: res[:, perm])
    inv_perm = np.argsort(perm)
    res = res.reshape(-1, perm.size)[:, inv_perm].reshape(K // 16, N * 16)

    # 3. invert the 16×16 tiling: (K/16, N/16, 16, 16) ← transpose(0,2,1,3)
    w = res.reshape(K // 16, N // 16, 16, 16)
    w = w.transpose(0, 2, 1, 3).reshape(K, N)

    if per_channel:
        # stored as (w & 0xF) of signed [-7,7]: sign-extend the nibble
        q4 = w.astype(np.int64)
        q4 = np.where(q4 >= 8, q4 - 16, q4)
        # scale was divided by 2^(8-4)=16 at pack (:221-226) and permuted
        s = s_channel.reshape(-1, scale_perm_single.size)
        s = s[:, np.argsort(scale_perm_single)].reshape(N) * 16.0
        return q4.astype(np.int8), s.astype(np.float32), None

    # per-group: stored as (q+8) ∈ [0,15]
    q4 = w.astype(np.int64) - 8
    s_extra = s_channel.reshape(-1, scale_perm_single.size)
    s_extra = s_extra[:, np.argsort(scale_perm_single)].reshape(N)
    sg = np.asarray(s_group, np.float32).reshape(-1, scale_perm.size)
    sg = sg[:, np.argsort(scale_perm)].reshape(K // 128, N)
    s_full = sg * s_extra[None, :]
    return (
        q4.astype(np.int8),
        s_extra.astype(np.float32),
        s_full.astype(np.float32),
    )


def pack_marlin(
    q4: np.ndarray,  # (K, N) signed int4 codes
    scale: np.ndarray,  # (G, N) fp32 group/channel scales
    *,
    group_size: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Forward Marlin packing (for export back to reference/vLLM format and
    for interop round-trip tests).  Returns (B, s_channel, s_group)."""
    K, N = q4.shape
    per_channel = group_size == -1
    perm, scale_perm, scale_perm_single = _marlin_perms(per_channel)

    if per_channel:
        w = q4.astype(np.int64) & 0xF
        s_channel = (scale.reshape(N) / 16.0).astype(np.float32)
        s_channel = s_channel.reshape(-1, scale_perm_single.size)
        s_channel = s_channel[:, scale_perm_single].reshape(1, N)
        s_group = np.zeros((0, N), np.float16)
    else:
        w = (q4.astype(np.int64) + 8) & 0xF
        w_deq = np.repeat(scale, group_size, axis=0) * q4.astype(np.float32)
        absmax = np.abs(w_deq).max(axis=0)
        absmax[absmax == 0] = 1.0
        s_extra = (absmax / 127.0).astype(np.float32)
        sg = (scale / s_extra[None, :]).astype(np.float16)
        s_channel = s_extra.reshape(-1, scale_perm_single.size)
        s_channel = s_channel[:, scale_perm_single].reshape(1, N)
        s_group = sg.reshape(-1, scale_perm.size)[:, scale_perm]
        s_group = s_group.reshape(K // group_size, N)

    w = w.reshape(K // 16, 16, N // 16, 16).transpose(0, 2, 1, 3)
    w = w.reshape(K // 16, N * 16)
    res = w.reshape(-1, perm.size)[:, perm].reshape(K // 16, N * 16)
    B = np.zeros((K // 16, N * 16 // 8), np.uint32)
    for i in range(8):
        B |= res[:, i::8].astype(np.uint32) << (4 * i)
    return B.view(np.int32), s_channel, s_group


_MARLIN_LINEARS = (
    ("q_proj", "self_attn.q_proj"),
    ("k_proj", "self_attn.k_proj"),
    ("v_proj", "self_attn.v_proj"),
    ("o_proj", "self_attn.o_proj"),
    ("gate_proj", "mlp.gate_proj"),
    ("up_proj", "mlp.up_proj"),
    ("down_proj", "mlp.down_proj"),
)


def load_qqq_hf_checkpoint(
    model_path: str, dtype=jnp.bfloat16
) -> Tuple[Dict[str, Any], Any]:
    """Load a reference-quantized HF checkpoint (quant_method == "qqq",
    quant_model.py:323-331) into our params pytree with TPU-packed weights.

    Repacking runs through the native host packer (qqq_tpu/native) — ~100×
    the NumPy path, which matters at 70B scale."""
    from qqq_tpu.models.config import ModelConfig
    from qqq_tpu.models.loader import _read_state_dict
    from qqq_tpu.native import pack_int4_host

    with open(os.path.join(model_path, "config.json")) as f:
        raw = json.load(f)
    qc = raw.pop("quantization_config", None)
    assert qc and qc.get("quant_method") == "qqq", "not a QQQ checkpoint"
    config = ModelConfig.from_hf(raw)
    sd = _read_state_dict(model_path)

    def fp(key):
        t = sd[key]
        if t.dtype == np.dtype("uint16"):
            t = (t.view(np.uint16).astype(np.uint32) << 16).view(np.float32)
        return np.asarray(t, np.float32)

    def linear(prefix: str, K: int, N: int) -> Dict[str, Any]:
        B = np.asarray(sd[f"{prefix}.B"])
        s_ch = fp(f"{prefix}.s_channel")
        s_g = sd.get(f"{prefix}.s_group")
        s_g = None if s_g is None or s_g.size == 0 else np.asarray(s_g)
        q4, s_channel, s_full = unpack_marlin(
            B, s_ch, s_g, infeatures=K, outfeatures=N
        )
        p: Dict[str, Any] = {"w_packed": jnp.asarray(pack_int4_host(q4))}
        if s_full is None:
            p["s_channel"] = jnp.asarray(s_channel)
        else:
            p["s_group"] = jnp.asarray(s_full)
        if f"{prefix}.bias" in sd:
            p["b"] = jnp.asarray(fp(f"{prefix}.bias"), dtype=dtype)
        return p

    H, I = config.hidden_size, config.intermediate_size
    dims = {
        "q_proj": (H, config.q_dim),
        "k_proj": (H, config.kv_dim),
        "v_proj": (H, config.kv_dim),
        "o_proj": (config.q_dim, H),
        "gate_proj": (H, I),
        "up_proj": (H, I),
        "down_proj": (I, H),
    }
    layers = []
    for i in range(config.num_hidden_layers):
        pre = f"model.layers.{i}"
        layer: Dict[str, Any] = {
            "input_layernorm": jnp.asarray(
                fp(f"{pre}.input_layernorm.weight"), dtype=dtype
            ),
            "post_attention_layernorm": jnp.asarray(
                fp(f"{pre}.post_attention_layernorm.weight"), dtype=dtype
            ),
        }
        for ours, theirs in _MARLIN_LINEARS:
            K, N = dims[ours]
            layer[ours] = linear(f"{pre}.{theirs}", K, N)
        layers.append(layer)

    params: Dict[str, Any] = {
        "embed": jnp.asarray(fp("model.embed_tokens.weight"), dtype=dtype),
        "layers": layers,
        "norm": jnp.asarray(fp("model.norm.weight"), dtype=dtype),
    }
    if config.tie_word_embeddings or "lm_head.weight" not in sd:
        params["lm_head"] = None
    else:
        params["lm_head"] = {
            "w": jnp.asarray(fp("lm_head.weight").T, dtype=dtype)
        }
    return params, config


def save_marlin_checkpoint(
    out_path: str,
    params: Dict[str, Any],
    config,
    *,
    group_size: int,
) -> None:
    """Export OUR packed params as a reference/vLLM-loadable QQQ checkpoint
    (the format QuantizedLlamaForCausalLM.from_pretrained expects,
    gptq/models/llama.py:333-341 + qlinear_marlin.py:97-133): per linear
    ``B``/``s_channel``[/``s_group``] buffers in Marlin layout, fp16 FP
    weights, and config.json quantization_config per quant_model.py:323-331.

    Per-group note: our native format keeps FULL fp32 group scales; the
    Marlin format stores fp16 double scales (scale/s_extra), so the export
    rounds through fp16 exactly like the reference's own pack()
    (qlinear_marlin.py:209-210).
    """
    from safetensors.numpy import save_file

    from qqq_tpu.core.packing import PACK_BLOCK  # noqa: F401 (doc anchor)
    from qqq_tpu.native import unpack_int4_host

    flat: Dict[str, np.ndarray] = {}

    def put_fp(key: str, arr) -> None:
        # ascontiguousarray: astype(order='K') keeps a transposed view's
        # F-layout and safetensors serializes the raw buffer as C-order
        flat[key] = np.ascontiguousarray(
            np.asarray(arr, np.float32).astype(np.float16)
        )

    def put_linear(prefix: str, lin: Dict[str, Any]) -> None:
        assert "w_packed" in lin, f"{prefix} is not packed W4A8"
        q4 = unpack_int4_host(np.asarray(lin["w_packed"]))
        K, N = q4.shape
        if group_size == -1:
            scale = np.asarray(lin["s_channel"], np.float32).reshape(1, N)
        else:
            scale = np.asarray(lin["s_group"], np.float32)
        B, s_channel, s_group = pack_marlin(q4, scale, group_size=group_size)
        flat[f"{prefix}.B"] = B
        flat[f"{prefix}.s_channel"] = s_channel.astype(np.float32)
        if group_size != -1:
            flat[f"{prefix}.s_group"] = s_group.astype(np.float16)
        if "b" in lin:
            put_fp(f"{prefix}.bias", lin["b"])

    for i, layer in enumerate(params["layers"]):
        pre = f"model.layers.{i}"
        put_fp(f"{pre}.input_layernorm.weight", layer["input_layernorm"])
        put_fp(
            f"{pre}.post_attention_layernorm.weight",
            layer["post_attention_layernorm"],
        )
        for ours, theirs in _MARLIN_LINEARS:
            put_linear(f"{pre}.{theirs}", layer[ours])

    put_fp("model.embed_tokens.weight", params["embed"])
    put_fp("model.norm.weight", params["norm"])
    head = params.get("lm_head")
    if head is not None:
        assert "w" in head, (
            "marlin export keeps the LM head FP (reference "
            "models/llama.py:306) — re-run without --quantize_lm_head"
        )
        put_fp("lm_head.weight", np.asarray(head["w"], np.float32).T)

    os.makedirs(out_path, exist_ok=True)
    save_file(flat, os.path.join(out_path, "model.safetensors"))
    cfg = dict(config.__dict__)
    cfg["model_type"] = "llama"
    cfg["architectures"] = ["LlamaForCausalLM"]
    cfg["quantization_config"] = {  # quant_model.py:323-327
        "group_size": group_size,
        "quant_method": "qqq",
        "wbits": 4,
    }
    with open(os.path.join(out_path, "config.json"), "w") as f:
        json.dump(cfg, f, indent=2)
