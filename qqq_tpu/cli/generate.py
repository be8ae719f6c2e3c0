"""Text-generation smoke CLI — the examples/test_model.py analogue.

Usage:
  python -m qqq_tpu.cli.generate --model_path <dir> \
      --prompt "The capital of France is" --max_new_tokens 64
"""

from __future__ import annotations

import argparse
import logging

import jax.numpy as jnp

logging.basicConfig(level=logging.INFO)


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", required=True)
    p.add_argument("--tokenizer_path", default=None)
    p.add_argument("--prompt", nargs="+",
                   default=["The capital of France is"])
    p.add_argument("--max_new_tokens", type=int, default=64)
    p.add_argument("--temperature", type=float, default=0.0)
    p.add_argument("--top_k", type=int, default=0)
    p.add_argument("--top_p", type=float, default=1.0)
    p.add_argument("--max_length", type=int, default=2048)
    p.add_argument("--kv_int8", action="store_true", default=True)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--spec_ngram", type=int, default=0,
                   help=">0: prompt-lookup speculative decoding (exact "
                        "for greedy; faster on repetitive continuations)")
    p.add_argument("--spec_k", type=int, default=4)
    return p.parse_args()


def main():
    args = parse_args()
    args.tokenizer_path = args.tokenizer_path or args.model_path
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    from transformers import AutoTokenizer

    from qqq_tpu.cli.eval import load_any
    from qqq_tpu.serve.engine import generate
    from qqq_tpu.serve.sampling import SamplingParams

    params, config = load_any(args.model_path, dtype)
    tok = AutoTokenizer.from_pretrained(args.tokenizer_path, use_fast=False)

    prompts = [tok(p).input_ids for p in args.prompt]
    sampling = SamplingParams(
        temperature=args.temperature,
        top_k=args.top_k,
        top_p=args.top_p,
        max_new_tokens=args.max_new_tokens,
        eos_token_id=tok.eos_token_id,
    )
    outs = generate(
        params, config, prompts, sampling,
        max_batch=max(len(prompts), 1),
        max_len=args.max_length,
        kv_quantized=args.kv_int8,
        dtype=dtype,
        spec_ngram=args.spec_ngram,
        spec_k=args.spec_k,
    )
    for prompt, out in zip(args.prompt, outs):
        print(f"=== {prompt!r}")
        print(tok.decode(out))


if __name__ == "__main__":
    main()
