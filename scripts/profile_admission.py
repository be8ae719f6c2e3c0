"""Phase-level profile of the Engine's admission (whole-bucket prefill).

bench_serving --out-len 1 shows engine prefill at ~72 ms/layer/admission
(bs=16 → 2 admissions of 8) while the standalone decoder_layer at (8,1024)
measures 22.7 ms/layer — a 3× gap somewhere in the admission wrapper.
This times each phase with true device fences (scalar fetch):

  1. scratch cache init (zeros (8, bucket) per layer)
  2. the prefill program: forward (8, 1024) + logits_at + sample
  3. per-row KV insert into the big cache (8 × _insert_fn analogue)

Usage: python -u scripts/profile_admission.py --mode w4a8 --layers 4,8
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _tpu_watchdog import progress  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from qqq_tpu.models import llama as m  # noqa: E402
from qqq_tpu.serve import kv_cache  # noqa: E402
from profile_engine_tick import llama7b, build  # noqa: E402


def fence(x):
    return float(jnp.max(jax.tree_util.tree_leaves(x)[0]
                         .astype(jnp.float32)[..., :1].reshape(-1)[:1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="w4a8", choices=("w4a8", "bf16"))
    ap.add_argument("--layers", default="4,8")
    ap.add_argument("--pb", type=int, default=8)
    ap.add_argument("--bucket", type=int, default=1024)
    ap.add_argument("--max-len", type=int, default=1280)
    ap.add_argument("--bs", type=int, default=16)
    args = ap.parse_args()
    quant = args.mode == "w4a8"
    PB, BK = args.pb, args.bucket

    progress(str(jax.devices()))
    for L in [int(x) for x in args.layers.split(",")]:
        cfg = llama7b(L)
        params = build(cfg, args.mode)
        progress(f"params L={L}")
        big = kv_cache.init(cfg, args.bs, args.max_len, quantized=quant)
        jax.block_until_ready(big[0]["k"])

        @jax.jit
        def scratch_init():
            return kv_cache.init(cfg, PB, BK, quantized=quant)

        @jax.jit
        def prefill(prm, toks, lens, caches1):
            pos = jnp.broadcast_to(
                jnp.arange(BK, dtype=jnp.int32)[None, :], (PB, BK))
            logits, caches1 = m.forward(
                prm, cfg, toks, caches=caches1,
                cache_len=jnp.zeros((PB,), jnp.int32), positions=pos,
                logits_at=lens - 1,
            )
            tok = jnp.argmax(logits[:, 0, :], axis=-1).astype(jnp.int32)
            return tok, caches1

        @functools.partial(jax.jit, donate_argnums=(0,))
        def insert(big, small, row, slot):
            def ins(b, s):
                s1 = jax.lax.dynamic_slice(
                    s, (row,) + (0,) * (s.ndim - 1), (1,) + s.shape[1:])
                return jax.lax.dynamic_update_slice(
                    b, s1, (slot,) + (0,) * (b.ndim - 1))
            return jax.tree.map(ins, big, small)

        toks = jnp.asarray(
            np.random.default_rng(0).integers(0, 32000, (PB, BK), np.int32))
        lens = jnp.full((PB,), BK, jnp.int32)

        # compile + warm all three
        c1 = scratch_init(); fence(c1)
        tok, c1 = prefill(params, toks, lens, c1); float(tok[0])
        big = insert(big, c1, jnp.int32(0), jnp.int32(0)); fence(big[0]["k"])
        progress(f"warm L={L}")

        def t_phase(fn, reps=3):
            best = None
            for _ in range(reps):
                t0 = time.perf_counter()
                fn()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            return best

        t_init = t_phase(lambda: fence(scratch_init()))

        def run_prefill():
            nonlocal c1
            c1 = scratch_init()
            tok, c1 = prefill(params, toks, lens, c1)
            float(tok[0])
        t_pref = t_phase(run_prefill)

        def run_insert():
            nonlocal big
            for i in range(PB):
                big = insert(big, c1, jnp.int32(i), jnp.int32(i))
            fence(big[0]["k"])
        t_ins = t_phase(run_insert)

        print(f"mode={args.mode} L={L}: scratch_init {t_init*1e3:8.1f} ms | "
              f"init+prefill+sample {t_pref*1e3:8.1f} ms | "
              f"8x insert {t_ins*1e3:8.1f} ms", flush=True)
        del params, big, c1
        jax.clear_caches()


if __name__ == "__main__":
    main()
