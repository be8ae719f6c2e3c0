"""END-TO-END parity: the reference's rotate → smooth → GPTQ pipeline run on
a tiny torch Llama (its own code, unmodified math) vs OUR pipeline on the
same weights and the same calibration tokens (VERDICT r1, item 1b).

Reference side (per examples/quant_model.py:270-335):
  fuse_layer_norms → rotate_model(Q) → QuantizedLlamaForCausalLM wrap →
  one-batch migration (smooth.py:75-78) → rebuild + re-rotate same Q →
  export_smoothed_model → layer-sequential GPTQ (gptq_llama_func semantics)
Ours:
  fuse_layer_norms → rotate_model(Q) → smooth_model → export_smoothed_model
  → apply_gptq(pack=False)

Asserts: per-stage scale_list parity AND final fake-quant logits / PPL parity.
"""

import copy
import logging

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from qqq_tpu.core import QuantSpec
from qqq_tpu.calib.gptq import gptq_quantize_matrix, hessian_init, hessian_update
from qqq_tpu.calib.pipeline import apply_gptq
from qqq_tpu.calib.rotation import fuse_layer_norms, rotate_model
from qqq_tpu.calib.smooth import export_smoothed_model, smooth_model
from qqq_tpu.models import forward
from qqq_tpu.models.config import ModelConfig

logging.getLogger("QQQ").setLevel(logging.WARNING)

NH = NKV = 4
HD = 32
H = NH * HD          # 128
I = 2 * H            # 256
V = 128
L = 2
B, T = 2, 16


@pytest.fixture(scope="module")
def ref():
    from refqqq import get_ref

    try:
        return get_ref()
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference not importable: {e}")


def _tiny_model(seed=0):
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(seed)
    cfg = LlamaConfig(
        vocab_size=V, hidden_size=H, intermediate_size=I,
        num_hidden_layers=L, num_attention_heads=NH, num_key_value_heads=NKV,
        max_position_embeddings=64, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    m = LlamaForCausalLM(cfg).eval()
    m.config.architectures = ["LlamaForCausalLM"]
    with torch.no_grad():
        for hl in m.model.layers:
            hl.input_layernorm.weight.mul_(
                torch.rand_like(hl.input_layernorm.weight) + 0.5
            )
            hl.post_attention_layernorm.weight.mul_(
                torch.rand_like(hl.post_attention_layernorm.weight) + 0.5
            )
    return m


OUR_CFG = ModelConfig(
    vocab_size=V, hidden_size=H, intermediate_size=I,
    num_hidden_layers=L, num_attention_heads=NH, num_key_value_heads=NKV,
    max_position_embeddings=64, rms_norm_eps=1e-6,
)


def _ref_smooth(ref, model, calib_ids, group_size=-1, method="os+"):
    """Run the reference's one-batch migration through its own wrapped model
    (smooth.py:47-98 semantics, data plumbing inlined)."""
    from refqqq import annotate_legacy_attrs, default_qconfigs

    a_q, w_q = default_qconfigs(group_size)
    annotate_legacy_attrs(model)
    qm = ref.smooth_llama.QuantizedLlamaForCausalLM(
        model, w_q, a_q, qinput=False, is_remove_padding=True
    ).eval()
    from QQQ.smooth.quantization.state import (  # noqa: E501 (ref import)
        enable_calibration_quantization,
    )

    enable_calibration_quantization(qm)
    ref.migration.set_search_class(method)
    ref.migration.scale_list.clear()
    for _, module in qm.named_modules():
        if hasattr(module, "set_cac_migrate"):
            try:
                module.set_cac_migrate(True)
            except TypeError:
                pass
    with torch.no_grad():
        qm(input_ids=calib_ids, attention_mask=torch.ones_like(calib_ids))
    return [s.clone() for s in ref.migration.scale_list]


def _ref_gptq_layer_sequential(ref, model, calib_ids, group_size=-1):
    """gptq_llama_func semantics (gptq/models/llama.py:27-162) on the plain
    HF model: per decoder layer, hook the 7 Linears, replay the calibration
    batch, fasterquant each in find_layers order, then move on — previous
    layers are already quantized when layer i's inputs are captured."""
    names = [
        "self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj",
        "self_attn.o_proj", "mlp.gate_proj", "mlp.up_proj", "mlp.down_proj",
    ]
    for li, layer in enumerate(model.model.layers):
        gptqs, handles = {}, []
        for name in names:
            mod = layer.get_submodule(name)
            g = ref.gptq.GPTQ(mod)
            g.quantizer = ref.quant.Quantizer()
            g.quantizer.configure(
                bits=4, perchannel=True, sym=True, groupsize=group_size,
                mse=False,
            )
            gptqs[name] = g

            def hook(m, inp, out, _g=g):
                _g.add_batch(inp[0].detach(), None)

            handles.append(mod.register_forward_hook(hook))
        with torch.no_grad():
            model(input_ids=calib_ids)
        for h in handles:
            h.remove()
        for name in names:
            gptqs[name].fasterquant(
                blocksize=128, percdamp=0.01, groupsize=group_size,
                actorder=True, static_groups=True,
            )
            gptqs[name].free()
    return model


@pytest.mark.parametrize("group_size", [-1, 128])
def test_e2e_rotate_smooth_gptq_parity(ref, group_size, rng):
    from refqqq import EasyDict, hf_to_params

    fp = _tiny_model(seed=3)
    calib = torch.randint(0, V, (B, T), generator=torch.Generator().manual_seed(7))
    eval_ids = torch.randint(0, V, (4, 24), generator=torch.Generator().manual_seed(11))
    Q_t = ref.hadamard.random_hadamard_matrix(H, "cpu")

    # ---------------- reference pipeline (its own code) ----------------
    m1 = copy.deepcopy(fp)
    m1 = ref.rotation.fuse_layer_norms(m1)
    m1, _ = ref.rotation.rotate_model(
        m1, EasyDict(rotate_mode="hadamard"), EasyDict(device="cpu"), Q_t
    )
    scale_list_ref = _ref_smooth(ref, m1, calib, group_size=group_size)

    # rebuild FP model, re-rotate with the SAME Q (quant_model.py:307-313)
    from refqqq import annotate_legacy_attrs

    m2 = copy.deepcopy(fp)
    m2 = ref.rotation.fuse_layer_norms(m2)
    m2, _ = ref.rotation.rotate_model(
        m2, EasyDict(rotate_mode="hadamard"), EasyDict(device="cpu"), Q_t
    )
    m2 = ref.export.export_smoothed_model(
        annotate_legacy_attrs(m2), scale_list_ref
    )
    m2 = _ref_gptq_layer_sequential(ref, m2, calib, group_size=group_size)
    with torch.no_grad():
        logits_ref = m2(input_ids=eval_ids).logits.float().numpy()

    # ---------------- our pipeline ----------------
    params = hf_to_params(fp)
    params = fuse_layer_norms(params, OUR_CFG)
    params, _ = rotate_model(params, OUR_CFG, Q=Q_t.numpy())
    w_spec = QuantSpec(bits=4, group_size=group_size)
    calib_j = jnp.asarray(calib.numpy().astype(np.int32))
    scale_list_ours = smooth_model(
        params, OUR_CFG, calib_j, method="os+", w_spec=w_spec
    )

    # per-stage: every migration scale must match the reference's
    assert len(scale_list_ours) == len(scale_list_ref) == 4 * L
    for i, (so, sr) in enumerate(zip(scale_list_ours, scale_list_ref)):
        np.testing.assert_allclose(
            np.asarray(so), sr.numpy(), rtol=5e-3, atol=1e-4,
            err_msg=f"scale_list[{i}]",
        )

    params = export_smoothed_model(params, OUR_CFG, scale_list_ours)
    # scale_store_dtype=None: the parity contract is "same math as the
    # reference", whose fasterquant selects codes with UN-rounded scales
    # (fp16 rounding happens only at pack time, qlinear_marlin.py:209-210).
    # The default bf16 pre-rounding is a deliberate TPU deviation tested in
    # test_kernels.py::test_w4a8_gemm_bf16_sgroup_storage.
    qparams, _ = apply_gptq(
        params, OUR_CFG, calib_j, w_spec, sample_batch=B, pack=False,
        dtype=jnp.float32, actorder=True, scale_store_dtype=None,
    )
    logits_ours, _ = forward(
        qparams, OUR_CFG, jnp.asarray(eval_ids.numpy().astype(np.int32))
    )
    logits_ours = np.asarray(logits_ours)

    # final fake-quant logits agree up to fp/grid noise.  per-group admits a
    # few GPTQ borderline-rounding cascades (torch vs XLA Hessians at ~1e-6,
    # see test_reference_parity.py) so its bound is the quantization step
    # itself; quality (PPL below) still matches to <2%.
    scale = np.abs(logits_ref).max()
    tol = 0.05 if group_size == -1 else 0.11
    np.testing.assert_allclose(
        logits_ours, logits_ref, atol=tol * scale
    )
    # …and the tiny-model "PPL" (exp mean CE on the eval tokens) matches
    def ppl(lg):
        lg = lg[:, :-1].reshape(-1, V)
        tgt = eval_ids.numpy()[:, 1:].reshape(-1)
        logp = lg - np.log(np.exp(lg - lg.max(-1, keepdims=True)).sum(-1, keepdims=True)) - lg.max(-1, keepdims=True)
        return float(np.exp(-logp[np.arange(tgt.size), tgt].mean()))

    p_ref, p_ours = ppl(logits_ref), ppl(logits_ours)
    assert abs(p_ours - p_ref) / p_ref < 0.02, (p_ours, p_ref)
