"""Trustworthy TPU microbenchmark harness.

The axon-tunneled TPU runtime acks dispatches before device execution
completes, so wall-clock around ``block_until_ready`` measures RPC enqueue
cost, not device time.  The only reliable fence is a device→host fetch.

``measure_op`` therefore:

1. runs the op ``n`` times inside ONE jitted ``lax.scan`` whose carry both
   (a) perturbs an input each iteration (defeats loop-invariant hoisting and
   CSE) and (b) consumes ``max(out)`` (defeats dead-code elimination; ``max``
   cannot be algebraically pushed through a matmul the way ``sum``/slices can);
2. fetches the scalar carry to force completion;
3. reports the slope between two iteration counts, cancelling fixed RPC/launch
   overhead (~30 ms round trip).
"""

from __future__ import annotations

import time
from typing import Callable, Sequence

import jax
import jax.numpy as jnp


def _run_scan(op: Callable, perturb: Callable, args, n: int):
    @jax.jit
    def run(args):
        def body(c, _):
            out = op(*perturb(args, c))
            return c + jnp.max(out).astype(jnp.float32) * 1e-30 + 1.0, None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return c

    return run


def measure_op(
    op: Callable,
    args: Sequence,
    perturb: Callable | None = None,
    target_secs: float = 0.3,
) -> float:
    """Seconds per execution of ``op(*args)`` on device.

    ``perturb(args, c) -> args`` must make at least one input depend on the
    fp32 scalar carry ``c`` (default: multiplies the first fp argument by
    ``(1 + 1e-30·c)`` — numerically a no-op, structurally a data dependence).

    Iteration counts auto-scale so device work dominates RPC latency: a crude
    pilot estimates per-iter time, then the final slope uses enough iterations
    to total ~``target_secs``.
    """
    if perturb is None:
        def perturb(a, c):
            a = list(a)
            for i, x in enumerate(a):
                if jnp.issubdtype(x.dtype, jnp.floating):
                    a[i] = x * (1 + 1e-30 * c).astype(x.dtype)
                    break
            else:
                raise ValueError("no float arg to perturb; pass perturb=")
            return tuple(a)

    # pilot: slope between 8 and 64 iterations
    t8 = _best(_run_scan(op, perturb, args, 8), args, 2)
    t64 = _best(_run_scan(op, perturb, args, 64), args, 2)
    t_est = max((t64 - t8) / 56, 1e-7)

    n_hi = int(min(max(target_secs / t_est, 128), 20000))
    n_lo = max(n_hi // 8, 8)
    t_lo = _best(_run_scan(op, perturb, args, n_lo), args, 3)
    t_hi = _best(_run_scan(op, perturb, args, n_hi), args, 3)
    return max((t_hi - t_lo) / (n_hi - n_lo), 1e-9)


def _best(run, args, reps: int) -> float:
    float(run(args))  # compile + warm
    return min(_timed(run, args) for _ in range(reps))


def _timed(run, args) -> float:
    t0 = time.time()
    float(run(args))  # scalar fetch = execution fence
    return time.time() - t0
