"""Does Mosaic's s8·s8→s32 MXU path depend on dot orientation?

The w4a8 GEMM kernel's standard-orientation int8 dots ((1,),(0,)) measure
347-363 TOPS (above bf16 peak), but the attention kernel's int8 QK^T with
contracting dims ((1,),(1,)) came out ~3-8% SLOWER than its bf16 dot
(scripts/bench_attention_roofline.py) — hypothesis: the transposed-RHS
form falls off the native int8 path.  This measures matched dots in
isolation: bf16 vs int8, both orientations, plus int8 with the RHS
pre-transposed outside the kernel.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _tpu_watchdog import progress  # noqa: E402

import functools  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from qqq_tpu.utils.benchmark import measure_op  # noqa: E402

M, K, N = 1024, 128, 1024
REPS = 16  # dots per kernel call (amortize call overhead)


def kern(a_ref, b_ref, o_ref, *, dn, out_t):
    acc = jnp.zeros((M, N), jnp.float32)
    a = a_ref[:]
    for i in range(REPS):
        d = jax.lax.dot_general(
            a, b_ref[:], dimension_numbers=(dn, ((), ())),
            preferred_element_type=out_t,
        )
        acc = acc + d.astype(jnp.float32)
        # feed a bit of the accumulator back into the next operand so the
        # REPS dots are data-dependent — otherwise Mosaic CSEs them into
        # one dot and the "measurement" reads 1.8x hardware peak
        # (M, 1) so the broadcast is lanes-only (Mosaic can't broadcast a
        # (1,1) scalar in both sublanes and lanes)
        dep = (acc[:, 0:1] > jnp.float32(1e30))
        a = a + dep.astype(a.dtype)
    o_ref[:] = acc


def run(name, a, b, dn, out_t):
    f = pl.pallas_call(
        functools.partial(kern, dn=dn, out_t=out_t),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        interpret=False,
    )
    t = measure_op(
        lambda a_, b_, f32dep: f(a_, b_) + 0 * f32dep,
        (a, b, jnp.zeros((1,), jnp.float32)),
        perturb=lambda ar, c: (ar[0], ar[1],
                               ar[2] * (1 + 1e-30 * c)),
    )
    tops = REPS * 2.0 * M * K * N / t / 1e12
    print(f"{name:34s} {t*1e6:8.1f} us  {tops:6.1f} TOPS", flush=True)


def main():
    progress(str(jax.devices()))
    key = jax.random.PRNGKey(0)
    a8 = jax.random.randint(key, (M, K), -127, 128, jnp.int8)
    b8_kn = jax.random.randint(key, (K, N), -127, 128, jnp.int8)
    b8_nk = jax.random.randint(key, (N, K), -127, 128, jnp.int8)
    ab = (jax.random.normal(key, (M, K)) * 0.1).astype(jnp.bfloat16)
    bb_kn = (jax.random.normal(key, (K, N)) * 0.1).astype(jnp.bfloat16)
    bb_nk = (jax.random.normal(key, (N, K)) * 0.1).astype(jnp.bfloat16)

    run("bf16 std   ((1,),(0,)) (K,N) rhs", ab, bb_kn, ((1,), (0,)),
        jnp.float32)
    progress("bf16 std")
    run("bf16 transp((1,),(1,)) (N,K) rhs", ab, bb_nk, ((1,), (1,)),
        jnp.float32)
    progress("bf16 t")
    run("int8 std   ((1,),(0,)) (K,N) rhs", a8, b8_kn, ((1,), (0,)),
        jnp.int32)
    progress("int8 std")
    run("int8 transp((1,),(1,)) (N,K) rhs", a8, b8_nk, ((1,), (1,)),
        jnp.int32)
    progress("int8 t")


if __name__ == "__main__":
    main()
