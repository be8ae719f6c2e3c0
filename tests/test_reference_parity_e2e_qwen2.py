"""Qwen2 END-TO-END parity vs the reference's own qwen2 code (VERDICT r2
item 8): its distinct qwen2 calibration path — qkv-BIAS threading through
migration (migration_qwen2.py:26-44), SDPA attention replay (:183-221),
v-bias divide in export (export.py qwen2 branch) — run on a tiny torch
Qwen2, against OUR unified pipeline on the same weights / same calibration
tokens.

Reference side (per examples/quant_model.py:270-335 with a qwen2 model):
  fuse_layer_norms → rotate_model(Q) → QuantizedQwen2ForCausalLM wrap →
  one-batch migration (migration_qwen2) → rebuild + re-rotate same Q →
  export_smoothed_model → layer-sequential GPTQ (hook semantics of
  gptq/models/qwen2.py:27-150 on the plain HF model)
Ours:
  the SAME unified flow the llama e2e test runs (models/llama.py serves
  qwen2 via attention_bias) — fuse → rotate → smooth → export → apply_gptq.

Asserts: per-stage scale_list parity AND final fake-quant logits / PPL
parity, both MHA and GQA (GQA additionally exercises the o_proj migration
fold-skip, export.py:27-31).
"""

import copy
import logging

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from qqq_tpu.core import QuantSpec
from qqq_tpu.calib.pipeline import apply_gptq
from qqq_tpu.calib.rotation import fuse_layer_norms, rotate_model
from qqq_tpu.calib.smooth import export_smoothed_model, smooth_model
from qqq_tpu.models import forward
from qqq_tpu.models.config import ModelConfig

from test_reference_parity_e2e import _ref_gptq_layer_sequential

logging.getLogger("QQQ").setLevel(logging.WARNING)

NH = 4
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


def _tiny_qwen2(nkv, seed=0):
    from transformers import Qwen2Config, Qwen2ForCausalLM

    torch.manual_seed(seed)
    cfg = Qwen2Config(
        vocab_size=V, hidden_size=H, intermediate_size=I,
        num_hidden_layers=L, num_attention_heads=NH, num_key_value_heads=nkv,
        max_position_embeddings=64, tie_word_embeddings=False,
        attn_implementation="sdpa",
    )
    m = Qwen2ForCausalLM(cfg).eval()
    m.config.architectures = ["Qwen2ForCausalLM"]
    with torch.no_grad():
        for hl in m.model.layers:
            hl.input_layernorm.weight.mul_(
                torch.rand_like(hl.input_layernorm.weight) + 0.5
            )
            hl.post_attention_layernorm.weight.mul_(
                torch.rand_like(hl.post_attention_layernorm.weight) + 0.5
            )
            # make the qkv biases non-trivial so bias threading is load-bearing
            for name in ("q_proj", "k_proj", "v_proj"):
                lin = hl.self_attn.get_submodule(name)
                lin.bias.add_(torch.randn_like(lin.bias) * 0.3)
    return m


def _our_cfg(nkv):
    return ModelConfig(
        model_type="qwen2", vocab_size=V, hidden_size=H, intermediate_size=I,
        num_hidden_layers=L, num_attention_heads=NH, num_key_value_heads=nkv,
        max_position_embeddings=64, rms_norm_eps=1e-6, attention_bias=True,
    )


def _ref_smooth_qwen2(ref, model, calib_ids, group_size=-1, method="os+"):
    """The reference's one-batch qwen2 migration through its own wrapped
    model (smooth.py:47-98 semantics; migration_qwen2 carries the biases)."""
    from refqqq import annotate_legacy_attrs_qwen2, default_qconfigs

    a_q, w_q = default_qconfigs(group_size)
    annotate_legacy_attrs_qwen2(model)
    qm = ref.smooth_qwen2.QuantizedQwen2ForCausalLM(
        model, w_q, a_q, qinput=False, is_remove_padding=True
    ).eval()
    from QQQ.smooth.quantization.state import (  # noqa: E501 (ref import)
        enable_calibration_quantization,
    )

    enable_calibration_quantization(qm)
    ref.migration_qwen2.set_search_class(method)
    ref.migration_qwen2.scale_list.clear()
    for _, module in qm.named_modules():
        if hasattr(module, "set_cac_migrate"):
            try:
                module.set_cac_migrate(True)
            except TypeError:
                pass
    with torch.no_grad():
        # use_cache=False skips the mirror's legacy DynamicCache plumbing
        # (qwen2.py:500-504 uses the pre-4.48 get_usable_length API)
        qm(
            input_ids=calib_ids,
            attention_mask=torch.ones_like(calib_ids),
            use_cache=False,
        )
    return [s.clone() for s in ref.migration_qwen2.scale_list]


@pytest.mark.parametrize(
    "nkv,group_size",
    [(NH, -1), (NH, 128), (2, -1)],
    ids=["mha_perchannel", "mha_g128", "gqa_perchannel"],
)
def test_qwen2_e2e_rotate_smooth_gptq_parity(ref, nkv, group_size, rng):
    from refqqq import (
        EasyDict,
        annotate_legacy_attrs_qwen2,
        hf_to_params,
    )

    fp = _tiny_qwen2(nkv, seed=5)
    our_cfg = _our_cfg(nkv)
    calib = torch.randint(
        0, V, (B, T), generator=torch.Generator().manual_seed(7)
    )
    eval_ids = torch.randint(
        0, V, (4, 24), generator=torch.Generator().manual_seed(11)
    )
    Q_t = ref.hadamard.random_hadamard_matrix(H, "cpu")

    # ---------------- reference pipeline (its own qwen2 code) --------------
    m1 = copy.deepcopy(fp)
    m1 = ref.rotation.fuse_layer_norms(m1)
    m1, _ = ref.rotation.rotate_model(
        m1, EasyDict(rotate_mode="hadamard"), EasyDict(device="cpu"), Q_t
    )
    scale_list_ref = _ref_smooth_qwen2(ref, m1, calib, group_size=group_size)

    # rebuild FP model, re-rotate with the SAME Q (quant_model.py:307-313)
    m2 = copy.deepcopy(fp)
    m2 = ref.rotation.fuse_layer_norms(m2)
    m2, _ = ref.rotation.rotate_model(
        m2, EasyDict(rotate_mode="hadamard"), EasyDict(device="cpu"), Q_t
    )
    m2 = ref.export.export_smoothed_model(
        annotate_legacy_attrs_qwen2(m2), scale_list_ref
    )
    m2 = _ref_gptq_layer_sequential(ref, m2, calib, group_size=group_size)
    with torch.no_grad():
        logits_ref = m2(input_ids=eval_ids).logits.float().numpy()

    # ---------------- our pipeline ----------------
    params = hf_to_params(fp)
    params = fuse_layer_norms(params, our_cfg)
    params, _ = rotate_model(params, our_cfg, Q=Q_t.numpy())
    w_spec = QuantSpec(bits=4, group_size=group_size)
    calib_j = jnp.asarray(calib.numpy().astype(np.int32))
    scale_list_ours = smooth_model(
        params, our_cfg, calib_j, method="os+", w_spec=w_spec
    )

    # per-stage: every migration scale must match the reference's.
    # 4 migrations/layer (qkv, o, gate_up, down) for MHA and GQA alike —
    # GQA only skips the o_proj FOLD at export time (export.py:27-31)
    assert len(scale_list_ours) == len(scale_list_ref) == 4 * L
    for i, (so, sr) in enumerate(zip(scale_list_ours, scale_list_ref)):
        np.testing.assert_allclose(
            np.asarray(so), sr.numpy(), rtol=5e-3, atol=1e-4,
            err_msg=f"scale_list[{i}]",
        )

    params = export_smoothed_model(params, our_cfg, scale_list_ours)
    qparams, _ = apply_gptq(
        params, our_cfg, calib_j, w_spec, sample_batch=B, pack=False,
        dtype=jnp.float32, actorder=True, scale_store_dtype=None,
    )
    logits_ours, _ = forward(
        qparams, our_cfg, jnp.asarray(eval_ids.numpy().astype(np.int32))
    )
    logits_ours = np.asarray(logits_ours)

    scale = np.abs(logits_ref).max()
    tol = 0.05 if group_size == -1 else 0.11
    np.testing.assert_allclose(logits_ours, logits_ref, atol=tol * scale)

    def ppl(lg):
        lg = lg[:, :-1].reshape(-1, V)
        tgt = eval_ids.numpy()[:, 1:].reshape(-1)
        mx = lg.max(-1, keepdims=True)
        logp = lg - np.log(np.exp(lg - mx).sum(-1, keepdims=True)) - mx
        return float(np.exp(-logp[np.arange(tgt.size), tgt].mean()))

    p_ref, p_ours = ppl(logits_ref), ppl(logits_ours)
    assert abs(p_ours - p_ref) / p_ref < 0.02, (p_ours, p_ref)
