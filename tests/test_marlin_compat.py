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
