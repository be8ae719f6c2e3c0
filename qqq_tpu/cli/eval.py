"""Evaluation CLI — the examples/eval_model.py analogue.

WikiText2 PPL (same slicing/normalization, eval_model.py:49-98) and the
five-task zero-shot suite (piqa, arc_easy, arc_challenge, hellaswag,
winogrande) via our own log-likelihood harness (the reference uses
lm_eval==0.4.2 externally).

Usage:
  python -m qqq_tpu.cli.eval --model_path <quantized_or_hf_dir> \
      --eval_ppl --tasks piqa,arc_easy
"""

from __future__ import annotations

import argparse
import json
import logging
import os

import jax.numpy as jnp

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger("qqq_tpu")


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", required=True)
    p.add_argument("--tokenizer_path", default=None)
    p.add_argument("--eval_ppl", action="store_true")
    p.add_argument("--ppl_dataset", default="wikitext2")
    p.add_argument("--allow_synthetic", action="store_true",
                   help="permit the random-token fallback when the dataset "
                        "can't be fetched (smoke runs only)")
    p.add_argument("--tasks", default="")
    p.add_argument("--max_length", type=int, default=2048)
    p.add_argument("--max_windows", type=int, default=0)
    p.add_argument("--num_fewshot", type=int, default=0)
    p.add_argument("--limit", type=int, default=0,
                   help="cap examples per zero-shot task (0 = all)")
    p.add_argument("--dtype", default="bfloat16")
    return p.parse_args()


def load_any(model_path: str, dtype):
    """Our quantized checkpoints, reference QQQ (Marlin-packed) HF
    checkpoints, or plain HF checkpoints — auto-detected."""
    from qqq_tpu.models import load_hf_model, load_quantized

    with open(os.path.join(model_path, "config.json")) as f:
        cfg_raw = json.load(f)
    if "quantization_config" in cfg_raw:
        # discriminate our layout (…w_packed keys) from the reference's
        # Marlin layout (….B / .s_channel buffers) by the tensor names
        from safetensors import safe_open

        st_files = sorted(
            f for f in os.listdir(model_path) if f.endswith(".safetensors")
        )
        with safe_open(
            os.path.join(model_path, st_files[0]), framework="np"
        ) as f:
            keys = list(f.keys())
        if any(k.endswith("w_packed") for k in keys):
            params, config, qc = load_quantized(model_path, dtype=dtype)
            logger.info("loaded our quantized checkpoint: %s", qc)
            return params, config
        from qqq_tpu.models.marlin_compat import load_qqq_hf_checkpoint

        params, config = load_qqq_hf_checkpoint(model_path, dtype=dtype)
        logger.info("loaded reference (Marlin-format) QQQ checkpoint")
        return params, config
    params, config = load_hf_model(model_path, dtype=dtype)
    return params, config


def main():
    args = parse_args()
    args.tokenizer_path = args.tokenizer_path or args.model_path
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    from qqq_tpu.utils.data import get_loaders
    from qqq_tpu.utils.eval import perplexity

    params, config = load_any(args.model_path, dtype)
    results = {}

    if args.eval_ppl:
        _, testenc = get_loaders(
            args.ppl_dataset,
            tokenizer_path=args.tokenizer_path,
            seed=0,
            seqlen=args.max_length,
            vocab_size=config.vocab_size,
            allow_synthetic=args.allow_synthetic,
        )
        ppl = perplexity(
            params, config, testenc,
            seqlen=args.max_length, max_windows=args.max_windows,
        )
        results[f"{args.ppl_dataset}_ppl"] = round(ppl, 4)
        logger.info("%s ppl = %.4f", args.ppl_dataset, ppl)

    if args.tasks:
        from qqq_tpu.cli.zeroshot import run_tasks

        task_results = run_tasks(
            params, config, args.tokenizer_path,
            args.tasks.split(","), limit=args.limit,
            num_fewshot=args.num_fewshot,
        )
        results.update(task_results)

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
