"""Engine-shaped decode-tick profile: per-layer slope of the REAL program.

profile_decode_tick.py measures components in isolation; this measures the
exact structure the Engine runs — a fused ``lax.scan`` of decode steps with
the caches as donated carry (serve/engine.py:_decode_multi) — at two layer
counts, so the per-layer per-step device time falls out of the slope with
every fixed cost (lm_head, sampling, dispatch) cancelled.

Timing: calls are CHAINED (tick i+1 consumes tick i's outputs) so the
tunnel's early-ack cannot hide device time; one scalar fetch at the end
fences the whole chain (utils/benchmark.py doctrine).

Usage (one mode per process — HBM is not reliably reclaimed):
  python -u scripts/profile_engine_tick.py --mode w4a8 --bs 16
  python -u scripts/profile_engine_tick.py --mode bf16 --bs 16
  python -u scripts/profile_engine_tick.py --mode w4a8 --bs 16 --paged
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _tpu_watchdog import progress  # noqa: E402 (starts on import)

import jax
import jax.numpy as jnp
import numpy as np

from qqq_tpu.models.config import ModelConfig
from qqq_tpu.models import llama as m
from qqq_tpu.serve import kv_cache as kvc
from qqq_tpu.serve import paged_kv as pkv


def llama7b(layers, tiny=False):
    if tiny:  # CPU smoke geometry
        return ModelConfig(
            model_type="llama", vocab_size=256, hidden_size=256,
            intermediate_size=512, num_hidden_layers=layers,
            num_attention_heads=4, num_key_value_heads=4,
            rms_norm_eps=1e-5, rope_theta=10000.0,
            max_position_embeddings=512, tie_word_embeddings=False,
        )
    return ModelConfig(
        model_type="llama", vocab_size=32000, hidden_size=4096,
        intermediate_size=11008, num_hidden_layers=layers,
        num_attention_heads=32, num_key_value_heads=32,
        rms_norm_eps=1e-5, rope_theta=10000.0, max_position_embeddings=4096,
        tie_word_embeddings=False,
    )


def build(cfg, mode):
    from __graft_entry__ import _quantize_params

    params = m.init_params(cfg, jax.random.PRNGKey(0))
    if mode == "w4a8":
        params = jax.block_until_ready(
            _quantize_params(params, cfg, group_size=-1)
        )
        params = m.fuse_inference_params(params, cfg)
    return params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="w4a8", choices=("w4a8", "bf16"))
    ap.add_argument("--bs", type=int, default=16)
    ap.add_argument("--s", type=int, default=1152)
    ap.add_argument("--layers", default="2,4")
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--chain", type=int, default=4)
    ap.add_argument("--paged", action="store_true")
    ap.add_argument("--block-size", type=int, default=128)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny geometry (CPU smoke)")
    args = ap.parse_args()
    if os.environ.get("QQQ_TPU_TEST_PLATFORM") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    B, S, n_steps = args.bs, args.s, args.steps
    quant = args.mode == "w4a8"

    results = {}
    progress("devices: %s" % (jax.devices(),))
    for L in [int(x) for x in args.layers.split(",")]:
        cfg = llama7b(L, tiny=args.tiny)
        params = build(cfg, args.mode)
        progress(f"params built L={L}")

        if args.paged:
            nblocks = B * (S // args.block_size) + 1
            caches = pkv.init(cfg, nblocks, args.block_size,
                              quantized=quant)
            nbmax = S // args.block_size
            tables = (
                np.arange(B * nbmax, dtype=np.int32).reshape(B, nbmax) + 1
            )
            tables_j = jnp.asarray(tables)
        else:
            caches = kvc.init(cfg, B, S, quantized=quant)
            tables_j = None

        # warm the cache to S-16·chain tokens valid (content is garbage —
        # fine for timing; scales zero ⇒ scores zero, still full reads)
        clen0 = S - n_steps * args.chain - 1
        inv = m.rope_inv_freq(cfg)

        # params/tables ride as ARGUMENTS — closed-over arrays would embed
        # the weights as HLO constants and ship ~400 MB to the remote
        # compile service (observed as a >600 s compile stall)
        @functools.partial(jax.jit, donate_argnums=(2,),
                           static_argnames=("paged",))
        def tick(prm, tok, caches, clen, key, tabs, paged):
            def body(carry, _):
                tok, caches, clen, key = carry
                key, sub = jax.random.split(key)
                logits, caches = m.forward(
                    prm, cfg, tok[:, None], caches=caches,
                    cache_len=clen, block_tables=tabs if paged else None,
                )
                nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
                return (nxt, caches, clen + 1, key), nxt

            (tok, caches, clen, key), toks = jax.lax.scan(
                body, (tok, caches, clen, key), None, length=n_steps
            )
            return tok, caches, clen, key, toks

        tok = jnp.zeros((B,), jnp.int32)
        clen = jnp.full((B,), clen0, jnp.int32)
        key = jax.random.PRNGKey(1)

        # compile + warm
        tok, caches, clen, key, toks = tick(
            params, tok, caches, clen, key, tables_j, args.paged)
        float(jnp.max(toks.astype(jnp.float32)))  # fence
        progress(f"compiled+warm L={L}")
        best = None
        for rep in range(3):
            clen = jnp.full((B,), clen0, jnp.int32)
            t0 = time.perf_counter()
            for _ in range(args.chain):
                tok, caches, clen, key, toks = tick(
                    params, tok, caches, clen, key, tables_j, args.paged)
            float(jnp.max(toks.astype(jnp.float32)))  # fence the chain
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        per_step = best / (args.chain * n_steps)
        results[L] = per_step
        print(f"mode={args.mode} paged={args.paged} bs={B} L={L}: "
              f"{per_step*1e3:.3f} ms/step", flush=True)

        del params, caches
        jax.clear_caches()

    Ls = sorted(results)
    if len(Ls) >= 2:
        sl = (results[Ls[-1]] - results[Ls[0]]) / (Ls[-1] - Ls[0])
        print(f"per-layer slope: {sl*1e6:.1f} us/layer/step", flush=True)


if __name__ == "__main__":
    main()
