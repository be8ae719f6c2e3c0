"""CLI pipeline smoke: quantize → eval → generate on a tiny HF checkpoint
(the reference's examples/* flow, with synthetic calibration data)."""

import json
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_hf_model(tmp_path_factory):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM, AutoTokenizer

    torch.manual_seed(0)
    cfg = LlamaConfig(
        vocab_size=256,
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=4,
        max_position_embeddings=256,
        torch_dtype="float32",
    )
    model = LlamaForCausalLM(cfg)
    path = str(tmp_path_factory.mktemp("hf") / "tiny")
    model.save_pretrained(path)
    return path


def _run(main, argv, monkeypatch):
    monkeypatch.setattr(sys, "argv", ["prog"] + argv)
    main()


def test_quantize_then_eval_cli(tiny_hf_model, tmp_path, monkeypatch, capsys):
    from qqq_tpu.cli.quantize import main as quantize_main
    from qqq_tpu.cli.eval import main as eval_main

    out = str(tmp_path / "quantized")
    _run(quantize_main, [
        "--model_path", tiny_hf_model,
        "--save_path", out,
        "--calib_dataset", "synthetic",
        "--nsamples", "4",
        "--max_length", "32",
        "--rotate", "hadamard",
        "--w_group_size", "128",
        "--dtype", "float32",
    ], monkeypatch)

    _run(eval_main, [
        "--model_path", out,
        "--eval_ppl",
        "--ppl_dataset", "synthetic",
        "--max_length", "32",
        "--max_windows", "4",
        "--dtype", "float32",
    ], monkeypatch)
    out_text = capsys.readouterr().out
    res = json.loads(out_text[out_text.index("{"):])
    ppl = res["synthetic_ppl"]
    assert np.isfinite(ppl) and ppl > 1.0
    # random tokens on a tiny quantized model: ppl should be near vocab size
    assert ppl < 10000


def test_quantize_smooth_cli(tiny_hf_model, tmp_path, monkeypatch):
    from qqq_tpu.cli.quantize import main as quantize_main

    out = str(tmp_path / "quantized_smooth")
    _run(quantize_main, [
        "--model_path", tiny_hf_model,
        "--save_path", out,
        "--calib_dataset", "synthetic",
        "--nsamples", "2",
        "--max_length", "16",
        "--smooth_method", "sq",
        "--dtype", "float32",
    ], monkeypatch)
    import os
    assert os.path.exists(os.path.join(out, "model.safetensors"))
    assert os.path.exists(out + "_scale_list.npz")
