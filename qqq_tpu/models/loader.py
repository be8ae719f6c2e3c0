"""HF checkpoint interop: import FP models, save/load quantized checkpoints.

Import mirrors the reference's use of ``from_pretrained`` (examples/
quant_model.py:286, eval_model.py:124-137) but maps straight into our
functional pytree: HF linear weights are stored (out, in) and transposed to
our (in, out) convention.

Quantized checkpoints are saved as safetensors + a ``quantization_config``
embedded in config.json with ``quant_method: "qqq"`` exactly like the
reference (quant_model.py:323-331), so the artifact story matches: rotate/
smooth/GPTQ once, then load the packed checkpoint anywhere.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from qqq_tpu.models.config import ModelConfig

_LAYER_LINEARS = (
    ("q_proj", "self_attn.q_proj"),
    ("k_proj", "self_attn.k_proj"),
    ("v_proj", "self_attn.v_proj"),
    ("o_proj", "self_attn.o_proj"),
    ("gate_proj", "mlp.gate_proj"),
    ("up_proj", "mlp.up_proj"),
    ("down_proj", "mlp.down_proj"),
)


def _read_state_dict(model_path: str) -> Dict[str, np.ndarray]:
    """Read all tensors from safetensors shards (or torch .bin fallback)."""
    tensors: Dict[str, np.ndarray] = {}
    st_files = sorted(
        f for f in os.listdir(model_path) if f.endswith(".safetensors")
    )
    if st_files:
        from safetensors import safe_open

        for fname in st_files:
            with safe_open(
                os.path.join(model_path, fname), framework="np"
            ) as f:
                for key in f.keys():
                    tensors[key] = f.get_tensor(key)
        return tensors
    bin_files = sorted(
        f
        for f in os.listdir(model_path)
        if f.startswith("pytorch_model") and f.endswith(".bin")
    )
    if not bin_files:
        raise FileNotFoundError(f"no weights found in {model_path}")
    import torch

    for fname in bin_files:
        sd = torch.load(
            os.path.join(model_path, fname), map_location="cpu",
            weights_only=True,
        )
        for key, val in sd.items():
            tensors[key] = val.float().numpy()
    return tensors


def load_hf_config(model_path: str) -> ModelConfig:
    with open(os.path.join(model_path, "config.json")) as f:
        raw = json.load(f)
    raw.pop("quantization_config", None)  # like eval_model.py:126-128
    return ModelConfig.from_hf(raw)


def load_hf_model(
    model_path: str, dtype=jnp.bfloat16, host: bool = False
) -> tuple[Dict[str, Any], ModelConfig]:
    """Import an HF Llama/Qwen2 checkpoint into our params pytree.

    ``host=True`` keeps leaves as NumPy arrays (no device transfer) for the
    calibration pipeline's ``stream_from_host`` mode — models larger than one
    chip's HBM."""
    config = load_hf_config(model_path)
    sd = _read_state_dict(model_path)
    import ml_dtypes

    np_dtype = ml_dtypes.bfloat16 if dtype == jnp.bfloat16 else np.float32
    place = (lambda x: np.asarray(x, np_dtype)) if host else (
        lambda x: jnp.asarray(x, dtype=dtype)
    )

    def arr(key: str) -> np.ndarray:
        t = sd[key]
        if t.dtype == np.dtype("uint16"):  # stored bf16 → via float32
            t = t.view(np.uint16).astype(np.uint32) << 16
            t = t.view(np.float32)
        return np.asarray(t, dtype=np.float32)

    def linear(prefix: str) -> Dict[str, Any]:
        p = {"w": place(arr(f"{prefix}.weight").T)}
        if f"{prefix}.bias" in sd:
            p["b"] = place(arr(f"{prefix}.bias"))
        return p

    layers = []
    for i in range(config.num_hidden_layers):
        pre = f"model.layers.{i}"
        layer = {
            "input_layernorm": place(arr(f"{pre}.input_layernorm.weight")),
            "post_attention_layernorm": place(
                arr(f"{pre}.post_attention_layernorm.weight")
            ),
        }
        for ours, theirs in _LAYER_LINEARS:
            layer[ours] = linear(f"{pre}.{theirs}")
        layers.append(layer)

    params: Dict[str, Any] = {
        "embed": place(arr("model.embed_tokens.weight")),
        "layers": layers,
        "norm": place(arr("model.norm.weight")),
    }
    if config.tie_word_embeddings or "lm_head.weight" not in sd:
        params["lm_head"] = None
    else:
        params["lm_head"] = linear("lm_head")
    return params, config


# ---------------------------------------------------------------------------
# quantized checkpoint save/load (our native format)


def _flatten(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    flat: Dict[str, np.ndarray] = {}

    def visit(prefix: str, obj: Any):
        if isinstance(obj, dict):
            for k, v in obj.items():
                visit(f"{prefix}.{k}" if prefix else k, v)
        elif isinstance(obj, list):
            for i, v in enumerate(obj):
                visit(f"{prefix}.{i}", v)
        elif obj is None:
            pass
        else:
            flat[prefix] = np.asarray(obj)

    visit("", params)
    return flat


def save_quantized(
    out_path: str,
    params: Dict[str, Any],
    config: ModelConfig,
    quant_config: Optional[Dict[str, Any]] = None,
) -> None:
    """Save packed params + config.json with quantization_config
    (mirrors quant_model.py:323-332)."""
    os.makedirs(out_path, exist_ok=True)
    from safetensors.numpy import save_file

    save_file(_flatten(params), os.path.join(out_path, "model.safetensors"))
    cfg = dict(config.__dict__)
    cfg["quantization_config"] = quant_config or {
        "quant_method": "qqq",
        "wbits": 4,
        "group_size": -1,
    }
    with open(os.path.join(out_path, "config.json"), "w") as f:
        json.dump(cfg, f, indent=2)


def load_quantized(
    model_path: str, dtype=jnp.bfloat16
) -> tuple[Dict[str, Any], ModelConfig, Dict[str, Any]]:
    """Load a checkpoint saved by :func:`save_quantized`."""
    with open(os.path.join(model_path, "config.json")) as f:
        raw = json.load(f)
    quant_config = raw.pop("quantization_config", {})
    config = ModelConfig(**{
        k: v for k, v in raw.items() if k in ModelConfig.__dataclass_fields__
    })

    from safetensors import safe_open

    flat: Dict[str, np.ndarray] = {}
    with safe_open(
        os.path.join(model_path, "model.safetensors"), framework="np"
    ) as f:
        for key in f.keys():
            flat[key] = f.get_tensor(key)

    params: Dict[str, Any] = {"layers": [{} for _ in range(config.num_hidden_layers)]}
    for key, val in flat.items():
        arr = jnp.asarray(val)
        # fp32 (scales, norms saved fp32) stays fp32; other floats → dtype
        if jnp.issubdtype(arr.dtype, jnp.floating) and arr.dtype != jnp.float32:
            arr = arr.astype(dtype)
        parts = key.split(".")
        node: Any = params
        for p in parts[:-1]:
            node = node[int(p)] if p.isdigit() else node.setdefault(p, {})
        node[parts[-1]] = arr
    if "lm_head" not in params:
        params["lm_head"] = None
    return params, config, quant_config
