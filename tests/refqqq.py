"""Import harness for the REFERENCE implementation (/root/reference, read-only).

Used by test_reference_parity.py to run the reference's own torch calibration
code on CPU as the oracle for our JAX implementations (VERDICT r1, item 1).

The reference assumes CUDA + an older transformers; we stub exactly the
*environment* (CUDA extension, easydict, fast_hadamard_transform) and patch the
*HF-glue attribute drift* (new-transformers LlamaAttention lost .hidden_size /
._init_rope, LlamaModel._update_causal_mask changed signature).  The
calibration math itself — GPTQ, Quantizer, observers, migration searchers,
rotation — runs completely unmodified.
"""

from __future__ import annotations

import importlib.machinery
import sys
import types

REFERENCE = "/root/reference"


class EasyDict(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)

    def __setattr__(self, k, v):
        self[k] = v


def _stub(name, **attrs):
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def _pkg_passthrough(name, path):
    """Register a package WITHOUT executing its __init__ (the reference inits
    import CUDA-/old-transformers-dependent symbols we don't need)."""
    if name in sys.modules:
        return sys.modules[name]
    m = types.ModuleType(name)
    m.__path__ = [path]
    m.__spec__ = importlib.machinery.ModuleSpec(name, None, is_package=True)
    sys.modules[name] = m
    return m


def _torch_hadamard(x, scale=1.0):
    """Butterfly Hadamard transform (stub for the CUDA fast_hadamard ext)."""
    import torch

    n = x.shape[-1]
    assert n & (n - 1) == 0, n
    shp = x.shape
    out = x.contiguous().clone()
    h = 1
    while h < n:
        out = out.view(*shp[:-1], n // (2 * h), 2, h)
        out = torch.stack(
            [out[..., 0, :] + out[..., 1, :], out[..., 0, :] - out[..., 1, :]],
            dim=-2,
        ).reshape(*shp)
        h *= 2
    return out * scale


_loaded = None


def get_ref():
    """Import the reference modules (cached).  Raises ImportError on failure —
    callers (pytest fixtures) turn that into a skip."""
    global _loaded
    if _loaded is not None:
        return _loaded

    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    # test_marlin_compat registers a bare (non-package) "QQQ" stub for its
    # file-level qlinear import; if that module ran first in the session,
    # `import QQQ.smooth...` here would fail with "QQQ is not a package" and
    # silently skip every parity test.  Upgrade the stub into a passthrough
    # package rooted at the reference tree.
    existing = sys.modules.get("QQQ")
    if existing is not None and not hasattr(existing, "__path__"):
        existing.__path__ = [f"{REFERENCE}/QQQ"]
        existing.__spec__ = importlib.machinery.ModuleSpec(
            "QQQ", None, is_package=True
        )
    if "easydict" not in sys.modules:
        _stub("easydict", EasyDict=EasyDict)
    if "fast_hadamard_transform" not in sys.modules:
        _stub("fast_hadamard_transform", hadamard_transform=_torch_hadamard)
    _stub("QQQ._CUDA", qqq_gemm=lambda *a, **k: None)
    # bypass QQQ/gptq/__init__.py (imports gptq.models → old-transformers API)
    _pkg_passthrough("QQQ.gptq", f"{REFERENCE}/QQQ/gptq")

    # CPU-only process: no-op the reference's CUDA housekeeping calls
    import torch

    torch.cuda.synchronize = lambda *a, **k: None
    torch.cuda.empty_cache = lambda *a, **k: None
    torch.cuda.get_device_capability = lambda *a, **k: (9, 0)
    # apply_exact_had_to_linear does `.cuda()` moves (hadamard_utils.py:131)
    torch.Tensor.cuda = lambda self, *a, **k: self

    import QQQ.gptq.gptq as gptq_mod
    import QQQ.gptq.quant as quant_mod
    import QQQ.smooth.quantization.observer as observer_mod
    import QQQ.smooth.quantization.quant_utils as quant_utils_mod
    import QQQ.smooth.migration.migration_llama as migration_mod
    import QQQ.smooth.migration.migration_qwen2 as migration_qwen2_mod
    import QQQ.smooth.models.llama as smooth_llama_mod
    import QQQ.smooth.models.qwen2 as smooth_qwen2_mod
    import QQQ.smooth.export as export_mod
    import QQQ.rotation.rotation as rotation_mod
    import QQQ.rotation.hadamard_utils as hadamard_mod

    _patch_smooth_llama(smooth_llama_mod)

    _loaded = types.SimpleNamespace(
        gptq=gptq_mod,
        quant=quant_mod,
        observer=observer_mod,
        quant_utils=quant_utils_mod,
        migration=migration_mod,
        migration_qwen2=migration_qwen2_mod,
        smooth_llama=smooth_llama_mod,
        smooth_qwen2=smooth_qwen2_mod,
        export=export_mod,
        rotation=rotation_mod,
        hadamard=hadamard_mod,
    )
    return _loaded


# ---------------------------------------------------------------------------
# new-transformers compatibility glue (HF attribute drift only, no math)


def _patch_smooth_llama(mod):
    import torch
    from transformers.models.llama.modeling_llama import LlamaRotaryEmbedding

    def _init_rope(self):
        # old LlamaAttention._init_rope: per-layer rotary embedding module
        self.rotary_emb = LlamaRotaryEmbedding(config=self.config)

    mod.QuantizedLlamaAttention._init_rope = _init_rope

    def _update_causal_mask(self, attention_mask, inputs_embeds):
        # old-HF 4D additive causal mask (pre-masking_utils signature)
        B, T = inputs_embeds.shape[:2]
        dtype = inputs_embeds.dtype
        minval = torch.finfo(dtype).min
        causal = torch.triu(
            torch.full((T, T), minval, dtype=dtype), diagonal=1
        )
        mask = causal[None, None, :, :].expand(B, 1, T, T).clone()
        if attention_mask is not None:
            pad = (1.0 - attention_mask[:, None, None, :].to(dtype)) * minval
            mask = mask + pad
        return mask

    mod.QuantizedLlamaModel._update_causal_mask = _update_causal_mask


def annotate_legacy_attrs(fp_model):
    """Attach the pre-4.48 attribute names the reference mirrors read from
    HF modules (they were moved onto config in newer transformers)."""
    cfg = fp_model.config
    head_dim = cfg.hidden_size // cfg.num_attention_heads
    # old LlamaModel registered a causal_mask buffer; the mirror copies it
    # (smooth/models/llama.py:423) but our patched _update_causal_mask
    # rebuilds the mask, so None is fine
    fp_model.model.causal_mask = None
    for layer in fp_model.model.layers:
        at = layer.self_attn
        at.hidden_size = cfg.hidden_size
        at.num_heads = cfg.num_attention_heads
        at.head_dim = head_dim
        at.num_key_value_heads = cfg.num_key_value_heads
        at.max_position_embeddings = cfg.max_position_embeddings
        at.rope_theta = cfg.rope_theta
        at.attention_dropout = getattr(cfg, "attention_dropout", 0.0)
        at.is_causal = True
        ml = layer.mlp
        ml.hidden_size = cfg.hidden_size
        ml.intermediate_size = cfg.intermediate_size
    return fp_model


def annotate_legacy_attrs_qwen2(fp_model):
    """Qwen2 analogue of :func:`annotate_legacy_attrs`: the reference's
    QuantizedQwen2* mirrors (smooth/models/qwen2.py:132-180, :338-361, :429-450)
    read pre-4.48 attribute names off the HF modules — num_heads & co. moved
    to config, and per-module ``rotary_emb`` handles were removed (one lives
    on the model now)."""
    cfg = fp_model.config
    head_dim = cfg.hidden_size // cfg.num_attention_heads
    fp_model.model._attn_implementation = "sdpa"  # asserted at qwen2.py:449
    for layer in fp_model.model.layers:
        layer.hidden_size = cfg.hidden_size
        at = layer.self_attn
        at.hidden_size = cfg.hidden_size
        at.num_heads = cfg.num_attention_heads
        at.head_dim = head_dim
        at.num_key_value_heads = cfg.num_key_value_heads
        at.max_position_embeddings = cfg.max_position_embeddings
        at.rope_theta = cfg.rope_theta
        at.attention_dropout = getattr(cfg, "attention_dropout", 0.0)
        at.is_causal = True
        at.rotary_emb = fp_model.model.rotary_emb  # qwen2.py:180 reads it
        ml = layer.mlp
        ml.hidden_size = cfg.hidden_size
        ml.intermediate_size = cfg.intermediate_size
    return fp_model


def hf_to_params(model, dtype=None):
    """Convert a torch HF Llama model to our functional params pytree
    ((in, out) weight layout — torch Linear stores (out, in))."""
    import jax.numpy as jnp

    dtype = dtype or jnp.float32

    def t(x):
        return jnp.asarray(x.detach().cpu().float().numpy(), dtype)

    def lin(mod):
        p = {"w": t(mod.weight).T}
        if getattr(mod, "bias", None) is not None:
            p["b"] = t(mod.bias)
        return p

    layers = []
    for hl in model.model.layers:
        layers.append(
            {
                "input_layernorm": t(hl.input_layernorm.weight),
                "post_attention_layernorm": t(
                    hl.post_attention_layernorm.weight
                ),
                "q_proj": lin(hl.self_attn.q_proj),
                "k_proj": lin(hl.self_attn.k_proj),
                "v_proj": lin(hl.self_attn.v_proj),
                "o_proj": lin(hl.self_attn.o_proj),
                "gate_proj": lin(hl.mlp.gate_proj),
                "up_proj": lin(hl.mlp.up_proj),
                "down_proj": lin(hl.mlp.down_proj),
            }
        )
    return {
        "embed": t(model.model.embed_tokens.weight),
        "layers": layers,
        "norm": t(model.model.norm.weight),
        "lm_head": None if model.config.tie_word_embeddings
        else lin(model.lm_head),
    }


def default_qconfigs(w_group_size=-1):
    """The reference CLI's default a/w qconfigs (examples/quant_model.py:21-120)."""
    a_q = EasyDict(
        quantizer="TokenFixedFakeQuantize",
        observer="MinMaxObserver",
        bit=8,
        symmetric=True,
        ch_axis=0,
    )
    w_q = EasyDict(
        quantizer="FixedQuantize" if w_group_size == -1 else "GroupFixedQuantize",
        observer="MinMaxObserver",
        bit=4,
        symmetric=True,
        ch_axis=0,
        group_size=w_group_size,
    )
    return a_q, w_q
