"""End-to-end SERVING benchmark through the Engine, reference protocol.

The reference's headline end-to-end numbers are same-batch throughput at
input 1024 / output 128 tokens for bs ∈ {1, 4, 16, 64} (README.md:127-129,
assets/figures/speedup.png), measured through vLLM.  This script measures
the same protocol through our own serving stack — Engine continuous
batching, bucketed prefill, INT8 KV cache, fused multi-step decode
(serve/engine.py) — on one TPU chip, with genuinely DISTINCT per-layer
weights (real HBM footprint).

Timing is honest on the tunneled runtime: every decode tick fetches the
sampled tokens to the host (np.asarray in Engine.run), which fences
execution — wall-clock across Engine.run measures device work, not RPC
enqueue (see utils/benchmark.py docstring).

Memory notes (v5e, 16 GB HBM):
* w4a8 Llama-2-7B: 3.6 GB packed weights; INT8 KV at bs=16/len 1280 is
  5.4 GB (MHA) — full 32-layer runs fit through bs=16.
* bf16 Llama-2-7B (13.5 GB weights) does NOT fit next to any cache, so the
  bf16-vs-w4a8 speedup is measured with both stacks at --layers 16
  (identical model halving — the ratio is layer-count invariant up to the
  constant lm_head/sampling term, which the 32L absolute runs include).
* ONE precision per process (--mode): the tunneled runtime does not
  reliably reclaim a released engine's HBM within a process.

Run (TPU):  python scripts/bench_serving.py --model llama2-7b --batches 1,4,16
            python scripts/bench_serving.py --model llama2-7b --layers 16 \
                --mode bf16 --batches 1,4     # then divide wall times
            python scripts/bench_serving.py --model llama3-8b --group-size 128
CPU check:  QQQ_TPU_TEST_PLATFORM=cpu python scripts/bench_serving.py \
                --model tiny --batches 1,2 --in-len 64 --out-len 16
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# the first compile-bearing run (32L paged long-context) can legitimately
# exceed the 300 s default; per-token progress() (engine on_token hook,
# below) covers everything after first tick, so only the compile window
# needs the larger budget
os.environ.setdefault("QQQ_TPU_WATCHDOG_SECS", "900")

from _tpu_watchdog import progress  # noqa: E402 (starts on import)

import jax

if os.environ.get("QQQ_TPU_TEST_PLATFORM") == "cpu":
    os.environ.setdefault(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
    )
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from qqq_tpu.models import ModelConfig  # noqa: E402

GEOMETRIES = {
    # config.json geometries of the HF checkpoints the reference targets
    "llama2-7b": dict(vocab_size=32000, hidden_size=4096,
                      intermediate_size=11008, num_hidden_layers=32,
                      num_attention_heads=32, num_key_value_heads=32,
                      max_position_embeddings=4096),
    "llama2-13b": dict(vocab_size=32000, hidden_size=5120,
                       intermediate_size=13824, num_hidden_layers=40,
                       num_attention_heads=40, num_key_value_heads=40,
                       max_position_embeddings=4096),
    "llama3-8b": dict(vocab_size=128256, hidden_size=4096,
                      intermediate_size=14336, num_hidden_layers=32,
                      num_attention_heads=32, num_key_value_heads=8,
                      rope_theta=500000.0, max_position_embeddings=8192),
    "qwen2-7b": dict(model_type="qwen2", vocab_size=152064,
                     hidden_size=3584, intermediate_size=18944,
                     num_hidden_layers=28, num_attention_heads=28,
                     num_key_value_heads=4, rope_theta=1000000.0,
                     attention_bias=True, max_position_embeddings=4096),
    "tiny": dict(vocab_size=256, hidden_size=256, intermediate_size=512,
                 num_hidden_layers=2, num_attention_heads=4,
                 num_key_value_heads=2, max_position_embeddings=512),
}


def build_params(config, *, quantize, group_size, seed=0):
    """Full params pytree with DISTINCT layers, built one at a time so the
    bf16 source of each quantized layer is freed before the next."""
    import dataclasses

    from qqq_tpu.models.llama import init_params
    from __graft_entry__ import _quantize_params

    cfg1 = dataclasses.replace(config, num_hidden_layers=1)
    top = init_params(
        dataclasses.replace(config, num_hidden_layers=0),
        jax.random.PRNGKey(seed),
    )
    layers = []
    for i in range(config.num_hidden_layers):
        p1 = init_params(cfg1, jax.random.PRNGKey(seed + 1 + i))
        layer = p1["layers"][0]
        if quantize:
            one = {"layers": [layer], "embed": None, "norm": None,
                   "lm_head": None}
            layer = jax.block_until_ready(
                _quantize_params(one, config, group_size=group_size)
            )["layers"][0]
        layers.append(layer)
        progress(f"built layer {i}")
        del p1
    top["layers"] = layers
    return top


def run_once(eng, config, bs, in_len, out_len, seed=1):
    from qqq_tpu.serve.engine import Request
    from qqq_tpu.serve.sampling import SamplingParams

    rng = np.random.default_rng(seed)
    reqs = [
        Request(
            prompt_tokens=rng.integers(
                0, config.vocab_size, size=in_len
            ).tolist(),
            sampling=SamplingParams(max_new_tokens=out_len),
        )
        for _ in range(bs)
    ]
    t0 = time.perf_counter()
    eng.run(reqs)
    dt = time.perf_counter() - t0
    progress(f"run bs={bs} in={in_len} out={out_len} done")
    for r in reqs:
        assert len(r.output_tokens) == out_len, len(r.output_tokens)
    return dt


def bench_config(config, *, quantize, group_size, bs, in_len, out_len,
                 steps_per_tick, params=None, prefill_chunk=0,
                 prefix_cache=False, spec_ngram=0, spec_k=4, paged=False,
                 block_size=128, num_blocks=None, prefill_batch=8,
                 repeats=2):
    from qqq_tpu.serve.engine import Engine

    if params is None:
        params = build_params(
            config, quantize=quantize, group_size=group_size
        )
    max_len = ((in_len + out_len + 127) // 128 + 1) * 128
    if prefill_chunk:
        max_len = ((max_len + prefill_chunk - 1)
                   // prefill_chunk) * prefill_chunk
    if paged:
        max_len = ((max_len + block_size - 1) // block_size) * block_size
    eng = Engine(
        params, config, max_batch=bs, max_len=max_len,
        kv_quantized=quantize, prefill_buckets=(in_len,),
        steps_per_tick=steps_per_tick,
        prefill_chunk=prefill_chunk, prefix_cache=prefix_cache,
        spec_ngram=spec_ngram, spec_k=spec_k, paged=paged,
        block_size=block_size, num_blocks=num_blocks,
        prefill_batch=prefill_batch,
    )
    # feed the stall watchdog from inside the run loop: every delivered
    # token is progress, so a long multi-minute run cannot trip the 300 s
    # idle timeout between run_once milestones (hook cost is a no-op
    # lambda per token, well under timing noise)
    eng.on_token = lambda req, tok: progress("tok")
    run_once(eng, config, bs, in_len, min(out_len, 2 * steps_per_tick))
    # repeats-and-median protocol (VERDICT r3 #4): single-shot points on the
    # tunneled runtime are bimodal at the ~10% level; report the median with
    # the spread so beat/miss calls can be judged against it
    times = sorted(
        run_once(eng, config, bs, in_len, out_len, seed=2 + i)
        for i in range(max(repeats, 1))
    )
    stats = dict(eng.stats)
    stats["latency"] = eng.latency_summary()
    del eng
    jax.clear_caches()
    return times, params, stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="llama2-7b", choices=GEOMETRIES)
    ap.add_argument("--group-size", type=int, default=-1)
    ap.add_argument("--batches", default="1,4")
    ap.add_argument("--in-len", type=int, default=1024)
    ap.add_argument("--out-len", type=int, default=128)
    ap.add_argument("--layers", type=int, default=0,
                    help="override layer count (0 = geometry default)")
    ap.add_argument("--steps-per-tick", type=int, default=16)
    ap.add_argument("--prefill-chunk", type=int, default=0,
                    help=">0: chunked prefill (tokens/tick, interleaved "
                         "with decode)")
    ap.add_argument("--prefix-cache", action="store_true",
                    help="slot-level prefix caching (needs --prefill-chunk)")
    ap.add_argument("--spec-ngram", type=int, default=0,
                    help=">0: prompt-lookup speculative decoding (forces "
                         "steps-per-tick=1; acceptance on random weights "
                         "comes from argmax cycles — see spec_accepted)")
    ap.add_argument("--spec-k", type=int, default=4)
    ap.add_argument("--prefill-batch", type=int, default=8,
                    help="max same-bucket prompts per prefill dispatch "
                         "(scratch cache is prefill_batch x bucket)")
    ap.add_argument("--paged", action="store_true",
                    help="paged KV cache (block pool + block tables)")
    ap.add_argument("--block-size", type=int, default=128)
    ap.add_argument("--num-blocks", type=int, default=0,
                    help="pool blocks (0 = cover max_batch x max_len)")
    ap.add_argument("--repeats", type=int, default=2,
                    help="timed runs per point; the record carries the "
                         "median plus min/max spread")
    ap.add_argument("--mode", default="w4a8", choices=("w4a8", "bf16"),
                    help="run ONE precision per process — HBM from a "
                         "released engine is not reliably reclaimed by the "
                         "tunneled runtime, so compare across two runs "
                         "(same --layers; use 16 for 7B so bf16 fits)")
    args = ap.parse_args()

    geo = dict(GEOMETRIES[args.model])
    if args.layers:
        geo["num_hidden_layers"] = args.layers
    config = ModelConfig(**geo)
    batches = [int(b) for b in args.batches.split(",")]
    quantize = args.mode == "w4a8"

    params = None
    for bs in batches:
        times, params, stats = bench_config(
            config, quantize=quantize, group_size=args.group_size, bs=bs,
            in_len=args.in_len, out_len=args.out_len,
            steps_per_tick=args.steps_per_tick, params=params,
            prefill_chunk=args.prefill_chunk,
            prefix_cache=args.prefix_cache,
            spec_ngram=args.spec_ngram, spec_k=args.spec_k,
            paged=args.paged, block_size=args.block_size,
            num_blocks=args.num_blocks or None,
            prefill_batch=args.prefill_batch,
            repeats=args.repeats,
        )
        dt = times[len(times) // 2] if len(times) % 2 else (
            (times[len(times) // 2 - 1] + times[len(times) // 2]) / 2
        )
        out_tps = bs * args.out_len / dt
        total_tps = bs * (args.in_len + args.out_len) / dt
        rec = {
            "model": args.model, "layers": config.num_hidden_layers,
            "mode": args.mode,
            "group_size": args.group_size if quantize else None, "bs": bs,
            "in": args.in_len, "out": args.out_len,
            "wall_s": round(dt, 3),
            "wall_min_s": round(times[0], 3),
            "wall_max_s": round(times[-1], 3),
            "repeats": len(times),
            "out_tok_s": round(out_tps, 1),
            "out_tok_s_max": round(bs * args.out_len / times[0], 1),
            "out_tok_s_min": round(bs * args.out_len / times[-1], 1),
            "total_tok_s": round(total_tps, 1),
        }
        lat = stats.get("latency") or {}
        if lat.get("ttft_p50_s") is not None:
            rec["ttft_p50_s"] = round(lat["ttft_p50_s"], 4)
        if lat.get("tpot_p50_s") is not None:
            rec["tpot_p50_ms"] = round(lat["tpot_p50_s"] * 1e3, 3)
        if args.spec_ngram:
            rec["spec_accepted"] = stats["spec_accepted"]
            rec["spec_drafted"] = stats["spec_drafted"]
            rec["decode_ticks"] = stats["decode_ticks"]
        if args.prefix_cache:
            rec["prefix_tokens_reused"] = stats["prefix_tokens_reused"]
        if args.paged:
            rec["preemptions"] = stats["preemptions"]
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
