"""Block sweep for the W4A8 GEMM at prefill-ladder M (VERDICT r3 #1 root
cause).

At M=8192 the r3 block picks (bm=512, bn=512, full-K bk) re-read the A
panel N/bn times and the packed W M/bm times — ~400 MB of HBM traffic per
(4096,4096) GEMM vs 0.275 TFLOP of compute, and the kernel measured 181
TOPS (scripts/profile_decode_tick.py --only prefill) against 347-363 at
M=1024 where re-reads are negligible.  This sweeps (bm, bn, bk) at large M
to find compute-bound picks; the winners go into _pick_blocks.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _tpu_watchdog import progress  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from qqq_tpu.core.packing import pack_int4  # noqa: E402
from qqq_tpu.kernels.w4a8_gemm import w4a8_gemm  # noqa: E402
from qqq_tpu.utils.benchmark import measure_op  # noqa: E402


def main():
    progress(str(jax.devices()))
    key = jax.random.PRNGKey(0)
    M = int(os.environ.get("SWEEP_M", "8192"))
    shapes = [(4096, 4096), (4096, 11008), (11008, 4096)]
    cands = [
        (0, 0, 0),            # current auto pick (baseline)
        (512, 512, 2048),
        (512, 1024, 1024),
        (512, 1024, 2048),
        (1024, 512, 2048),
        (1024, 1024, 1024),
        (1024, 1024, 2048),
        (2048, 512, 1024),
        (1024, 2048, 1024),
    ]
    for K, N in shapes:
        kk = jax.random.fold_in(key, K * 31 + N)
        a = jax.random.randint(kk, (M, K), -127, 128, jnp.int8)
        st = jnp.abs(jax.random.normal(kk, (M, 1), jnp.float32)) * 0.01
        q = jax.random.randint(kk, (K, N), -7, 8, jnp.int32)
        wp = pack_int4(q)
        sc = jnp.abs(jax.random.normal(kk, (N,), jnp.float32)) * 0.01
        print(f"== M={M} K={K} N={N}", flush=True)
        for bm, bn, bk in cands:
            if bk and (bk > K or K % bk):
                continue
            if bm and M % bm:
                continue
            try:
                t = measure_op(
                    lambda a_, st_, wp_, sc_, bm=bm, bn=bn, bk=bk:
                    w4a8_gemm(a_, st_, wp_, sc_, None, group_size=-1,
                              block_m=bm, block_n=bn, block_k=bk),
                    (a, st, wp, sc),
                    perturb=lambda ar, c: (
                        ar[0], ar[1] * (1 + 1e-30 * c), ar[2], ar[3]),
                )
                tops = 2.0 * M * K * N / t / 1e12
                print(f"  bm={bm or 'auto':>5} bn={bn or 'auto':>5} "
                      f"bk={bk or 'auto':>5}: {t*1e6:8.1f} us "
                      f"{tops:6.1f} TOPS", flush=True)
            except Exception as e:
                print(f"  bm={bm} bn={bn} bk={bk}: FAIL "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)
            progress(f"{K}x{N} {bm},{bn},{bk}")


if __name__ == "__main__":
    main()
