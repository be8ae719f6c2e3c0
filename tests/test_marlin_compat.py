"""Marlin-format interop: our unpacker must invert the REFERENCE's own
QuantLinear.pack().  We import the reference implementation (read-only, CUDA
bits stubbed out) and round-trip random weights through it."""

import sys
import types

import numpy as np
import jax.numpy as jnp
import pytest

from qqq_tpu.core import QuantSpec, find_params_weight, quantize_weight_int
from qqq_tpu.models.marlin_compat import unpack_marlin, pack_marlin

REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def reference_quantlinear():
    """Import the reference QuantLinear with CUDA dependencies stubbed."""
    import importlib.util

    import torch

    # stub the package chain so the module file imports without the
    # reference's unavailable deps (easydict, the CUDA extension)
    pkg = types.ModuleType("QQQ")
    cuda_stub = types.ModuleType("QQQ._CUDA")
    cuda_stub.qqq_gemm = lambda *a, **k: None
    pkg._CUDA = cuda_stub
    sys.modules.setdefault("QQQ", pkg)
    sys.modules.setdefault("QQQ._CUDA", cuda_stub)
    # QuantLinear.__init__ probes CUDA capability; keep the stub in place for
    # the whole test module (CPU-only process, reference pack() runs on CPU)
    torch.cuda.get_device_capability = lambda *a: (9, 0)
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_qlinear_marlin",
            f"{REFERENCE}/QQQ/gptq/qlinear/qlinear_marlin.py",
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    except Exception as e:
        pytest.skip(f"reference not importable: {e}")
    return mod.QuantLinear


def _fake_quant_weights(rng, K, N, group_size):
    spec = QuantSpec(bits=4, group_size=group_size)
    w = rng.normal(size=(K, N)).astype(np.float32)
    scale, zero = find_params_weight(jnp.asarray(w), spec)
    q4 = quantize_weight_int(jnp.asarray(w), scale, zero, spec)
    return np.asarray(q4), np.asarray(scale)


@pytest.mark.parametrize("group_size", [-1, 128])
def test_unpack_inverts_reference_pack(rng, reference_quantlinear, group_size):
    import torch

    K, N = 256, 256
    q4, scale = _fake_quant_weights(rng, K, N, group_size)
    # dequantized weights as the reference's pack() input ((out,in) layout)
    g = K if group_size == -1 else group_size
    scale_rows = np.repeat(scale, g, axis=0)  # (K, N)
    w_deq = (q4.astype(np.float32) * scale_rows).astype(np.float16)

    ql = reference_quantlinear(
        bits=4, group_size=group_size, infeatures=K, outfeatures=N, bias=False
    )
    linear = torch.nn.Linear(K, N, bias=False)
    linear.weight.data = torch.tensor(w_deq.T.copy(), dtype=torch.half)
    # reference pack signature: scales (in alias groups layout) (N, G)->(...)
    scales_t = torch.tensor(scale.T.copy(), dtype=torch.half)  # (N, G)
    if group_size == -1:
        ql.pack(linear, scales_t)
    else:
        w_full = q4.astype(np.float32) * scale_rows
        absmax = np.abs(w_full).max(axis=0)
        absmax[absmax == 0] = 1.0
        s_extra = torch.tensor(
            (absmax / 127.0).reshape(1, N), dtype=torch.float32
        )
        ql.pack(linear, scales_t, s_extra)

    B = ql.B.numpy()
    s_channel = ql.s_channel.numpy()
    s_group = ql.s_group.numpy() if ql.s_group.numel() else None

    q4_got, s_ch_got, s_full_got = unpack_marlin(
        B, s_channel, s_group, infeatures=K, outfeatures=N
    )
    if group_size == -1:
        np.testing.assert_array_equal(q4_got, q4)
        np.testing.assert_allclose(s_ch_got, scale[0], rtol=1e-3)
    else:
        np.testing.assert_array_equal(q4_got, q4)
        # full scale = s_group(fp16) · s_extra ≈ original group scale
        np.testing.assert_allclose(s_full_got, scale, rtol=2e-3)


@pytest.mark.parametrize("group_size", [-1, 128])
def test_pack_marlin_roundtrip(rng, group_size):
    """Our own pack_marlin/unpack_marlin are mutual inverses."""
    K, N = 256, 128
    q4, scale = _fake_quant_weights(rng, K, N, group_size)
    B, s_ch, s_g = pack_marlin(q4, scale, group_size=group_size)
    q4_got, s_ch_got, s_full_got = unpack_marlin(
        B, s_ch, s_g if group_size != -1 else None,
        infeatures=K, outfeatures=N,
    )
    np.testing.assert_array_equal(q4_got, q4)
    if group_size == -1:
        np.testing.assert_allclose(s_ch_got, scale[0], rtol=1e-6)
    else:
        np.testing.assert_allclose(s_full_got, scale, rtol=2e-3)


@pytest.mark.parametrize("group_size", [-1, 128])
def test_reference_pack_matches_ours(rng, reference_quantlinear, group_size):
    """pack_marlin reproduces the reference's B buffer bit-for-bit (so our
    *export* to reference/vLLM format is valid too)."""
    import torch

    K, N = 256, 256
    q4, scale = _fake_quant_weights(rng, K, N, group_size)
    g = K if group_size == -1 else group_size
    scale_rows = np.repeat(scale, g, axis=0)
    w_deq = (q4.astype(np.float32) * scale_rows).astype(np.float16)

    ql = reference_quantlinear(
        bits=4, group_size=group_size, infeatures=K, outfeatures=N, bias=False
    )
    linear = torch.nn.Linear(K, N, bias=False)
    linear.weight.data = torch.tensor(w_deq.T.copy(), dtype=torch.half)
    scales_t = torch.tensor(scale.T.copy(), dtype=torch.half)
    if group_size == -1:
        ql.pack(linear, scales_t)
    else:
        w_full = q4.astype(np.float32) * scale_rows
        absmax = np.abs(w_full).max(axis=0)
        absmax[absmax == 0] = 1.0
        s_extra = torch.tensor(
            (absmax / 127.0).reshape(1, N), dtype=torch.float32
        )
        ql.pack(linear, scales_t, s_extra)

    B_ours, s_ch_ours, _ = pack_marlin(q4, scale, group_size=group_size)
    np.testing.assert_array_equal(B_ours, ql.B.numpy())


def test_reference_checkpoint_loads_end_to_end(rng, tmp_path):
    """Synthesize a reference-format (Marlin-packed) HF checkpoint, load it
    through the CLI auto-detect path, and check the model runs with logits
    close to the dense fake-quant equivalent."""
    import json

    from safetensors.numpy import save_file

    from qqq_tpu.models import ModelConfig, forward
    from qqq_tpu.cli.eval import load_any

    cfg = ModelConfig(
        vocab_size=64, hidden_size=128, intermediate_size=256,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64,
    )
    flat = {}
    dense = {}

    def add_linear(prefix, K, N):
        q4, scale = _fake_quant_weights(rng, K, N, -1)
        B, s_ch, _ = pack_marlin(q4, scale, group_size=-1)
        flat[f"{prefix}.B"] = B
        flat[f"{prefix}.s_channel"] = s_ch
        dense[prefix] = q4.astype(np.float32) * np.repeat(scale, K, axis=0)

    H, I = cfg.hidden_size, cfg.intermediate_size
    for i in range(cfg.num_hidden_layers):
        pre = f"model.layers.{i}"
        for name, (K, N) in {
            "self_attn.q_proj": (H, H), "self_attn.k_proj": (H, H),
            "self_attn.v_proj": (H, H), "self_attn.o_proj": (H, H),
            "mlp.gate_proj": (H, I), "mlp.up_proj": (H, I),
            "mlp.down_proj": (I, H),
        }.items():
            add_linear(f"{pre}.{name}", K, N)
        flat[f"{pre}.input_layernorm.weight"] = np.ones(H, np.float32)
        flat[f"{pre}.post_attention_layernorm.weight"] = np.ones(H, np.float32)
    flat["model.embed_tokens.weight"] = (
        rng.normal(size=(cfg.vocab_size, H)).astype(np.float32) * 0.1
    )
    flat["model.norm.weight"] = np.ones(H, np.float32)
    flat["lm_head.weight"] = (
        rng.normal(size=(cfg.vocab_size, H)).astype(np.float32) * 0.1
    )

    path = tmp_path / "ref_ckpt"
    path.mkdir()
    save_file(flat, str(path / "model.safetensors"))
    with open(path / "config.json", "w") as f:
        json.dump({
            "model_type": "llama", "vocab_size": cfg.vocab_size,
            "hidden_size": H, "intermediate_size": I,
            "num_hidden_layers": 1, "num_attention_heads": 4,
            "num_key_value_heads": 4, "max_position_embeddings": 64,
            "rms_norm_eps": 1e-5,
            "quantization_config": {
                "quant_method": "qqq", "wbits": 4, "group_size": -1,
            },
        }, f)

    params, config = load_any(str(path), jnp.float32)
    assert "w_packed" in params["layers"][0]["q_proj"]
    tokens = jnp.asarray(rng.integers(0, 64, size=(2, 8)).astype(np.int32))
    logits, _ = forward(params, config, tokens)
    assert np.all(np.isfinite(np.asarray(logits)))

    # dense equivalent: same dequantized weights, fp path + act-quant noise
    dense_params = {
        "embed": jnp.asarray(flat["model.embed_tokens.weight"]),
        "norm": jnp.asarray(flat["model.norm.weight"]),
        "lm_head": {"w": jnp.asarray(flat["lm_head.weight"].T)},
        "layers": [{
            "input_layernorm": jnp.ones(H, jnp.float32),
            "post_attention_layernorm": jnp.ones(H, jnp.float32),
            **{
                ours: {"w": jnp.asarray(dense[f"model.layers.0.{theirs}"])}
                for ours, theirs in (
                    ("q_proj", "self_attn.q_proj"),
                    ("k_proj", "self_attn.k_proj"),
                    ("v_proj", "self_attn.v_proj"),
                    ("o_proj", "self_attn.o_proj"),
                    ("gate_proj", "mlp.gate_proj"),
                    ("up_proj", "mlp.up_proj"),
                    ("down_proj", "mlp.down_proj"),
                )
            },
        }],
    }
    want, _ = forward(dense_params, config, tokens)
    scale = float(np.abs(np.asarray(want)).max())
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(want), atol=0.05 * scale
    )


@pytest.mark.parametrize("group_size", [-1, 128])
def test_marlin_export_roundtrip_cli(rng, tmp_path, group_size):
    """our pipeline → --save_format marlin → our marlin loader: logits must
    match the native-format checkpoint (VERDICT r1 next #6).  The exported
    checkpoint has exactly the reference's buffer names/shapes
    (qlinear_marlin.py:97-133), so the reference's from_pretrained
    (gptq/models/llama.py:333-341) would accept it."""
    import sys

    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    from qqq_tpu.cli.quantize import main as quantize_main
    from qqq_tpu.cli.eval import load_any
    from qqq_tpu.models import forward
    from safetensors import safe_open

    torch.manual_seed(0)
    hf = LlamaForCausalLM(LlamaConfig(
        vocab_size=128, hidden_size=128, intermediate_size=256,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128, torch_dtype="float32",
    ))
    src = str(tmp_path / "src")
    hf.save_pretrained(src)

    def run(argv):
        old = sys.argv
        sys.argv = ["prog"] + argv
        try:
            quantize_main()
        finally:
            sys.argv = old

    base = [
        "--model_path", src, "--calib_dataset", "synthetic",
        "--nsamples", "2", "--max_length", "16", "--dtype", "float32",
        "--w_group_size", str(group_size),
    ]
    native = str(tmp_path / "native")
    marlin = str(tmp_path / "marlin")
    run(base + ["--save_path", native])
    run(base + ["--save_path", marlin, "--save_format", "marlin"])

    # exported buffers carry the reference names and dtypes
    with safe_open(f"{marlin}/model.safetensors", framework="np") as f:
        keys = set(f.keys())
        assert "model.layers.0.self_attn.q_proj.B" in keys
        assert "model.layers.0.self_attn.q_proj.s_channel" in keys
        assert ("model.layers.0.self_attn.q_proj.s_group" in keys) == (
            group_size != -1
        )
        B = f.get_tensor("model.layers.0.self_attn.q_proj.B")
        assert B.dtype == np.int32 and B.shape == (128 // 16, 128 * 16 // 8)

    pn, cn = load_any(native, jnp.float32)
    pm, cm = load_any(marlin, jnp.float32)
    toks = jnp.asarray(rng.integers(0, 128, size=(2, 8)).astype(np.int32))
    ln, _ = forward(pn, cn, toks)
    lm, _ = forward(pm, cm, toks)
    scale = float(np.abs(np.asarray(ln)).max())
    if group_size == -1:
        # quantized weights round-trip exactly (fp32 scales); the residual
        # is fp16 storage of the FP tensors (embed/head/norms) — the Marlin
        # checkpoint format's own precision (reference stores half)
        np.testing.assert_allclose(
            np.asarray(lm), np.asarray(ln), atol=1.5e-2 * scale
        )
    else:
        # per-group rounds through fp16 double scales (the Marlin format's
        # own precision, qlinear_marlin.py:209-210)
        np.testing.assert_allclose(
            np.asarray(lm), np.asarray(ln), atol=2e-2 * scale
        )
