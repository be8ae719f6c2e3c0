"""Hessian-based GPTQ weight compensation, vectorized for TPU.

Re-derivation of the reference algorithm (QQQ/gptq/gptq.py:17-226) in our
(K, N) = (in, out) layout — reference columns are our rows.  The math is
identical; the schedule is rebuilt for XLA:

* Hessian accumulation with running renormalization (gptq.py:54-59) is a pure
  function over (H, nsamples).
* The column-sequential error-feedback loop (gptq.py:119-168) becomes a
  ``lax.scan`` over rows inside each 128-row block, with full-width masked
  updates instead of Python-slice mutation (same arithmetic, static shapes).
* Group scales use ``static_groups=True`` semantics — the reference's default
  configuration (examples/quant_model.py:180-207): all group parameters are
  computed on the *original* weights up front (gptq.py:91-100), then looked up
  through the act-order permutation (``groups[perm[idx] // g]``,
  gptq.py:144-148).  This is exactly what makes the whole schedule
  vectorizable: scales become a precomputed (K, N) per-row array.
* Act-order permutation by descending diag(H) (gptq.py:102-106) is a gather.
* Cholesky chain: ``H → chol → inv → chol(upper)`` (gptq.py:111-117) in fp32
  with 1% mean-diagonal damping.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from qqq_tpu.core.quant import QuantSpec, find_params_weight


def hessian_init(k: int) -> Tuple[jax.Array, jax.Array]:
    return jnp.zeros((k, k), jnp.float32), jnp.zeros((), jnp.float32)


def hessian_update(
    H: jax.Array, nsamples: jax.Array, x: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """One batch of layer inputs ``x``: (tokens, K).  gptq.py:31-59."""
    x = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    t = x.shape[0]
    new_n = nsamples + t
    H = H * (nsamples / new_n)
    H = H + (2.0 / new_n) * jnp.einsum(
        "ti,tj->ij", x, x, preferred_element_type=jnp.float32
    )
    return H, new_n


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GPTQResult:
    w_deq: jax.Array       # (K, N) fp32 fake-quantized weights
    q4: jax.Array          # (K, N) int8 signed codes in [-8, 7]
    scale: jax.Array       # (G, N) fp32
    zero: jax.Array        # (G, N) fp32
    loss: jax.Array        # scalar Σ losses (gptq.py:176-178)


def _cholesky_inv_chain(H: jax.Array, percdamp: float) -> jax.Array:
    """gptq.py:111-117: damped H → lower chol → inverse → upper chol."""
    K = H.shape[0]
    damp = percdamp * jnp.mean(jnp.diag(H))
    H = H + jnp.eye(K, dtype=H.dtype) * damp
    L = jnp.linalg.cholesky(H)
    eye = jnp.eye(K, dtype=H.dtype)
    Linv = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
    Hinv = Linv.T @ Linv
    return jax.scipy.linalg.cholesky(Hinv, lower=False)  # upper: Hinv = UᵀU


@functools.partial(
    jax.jit,
    static_argnames=(
        "spec", "blocksize", "percdamp", "actorder", "scale_store_dtype"
    ),
)
def gptq_quantize_matrix(
    W: jax.Array,  # (K, N) fp32
    H: jax.Array,  # (K, K) fp32
    spec: QuantSpec,
    *,
    blocksize: int = 128,
    percdamp: float = 0.01,
    actorder: bool = True,
    scale_store_dtype=None,  # e.g. jnp.bfloat16: round group scales to the
                             # storage dtype before code selection
) -> GPTQResult:
    W = W.astype(jnp.float32)
    K, N = W.shape
    g = K if spec.per_channel else spec.group_size
    assert K % blocksize == 0, (K, blocksize)

    # dead columns (gptq.py:83-85)
    diag = jnp.diag(H)
    dead = diag == 0
    H = H + jnp.diag(jnp.where(dead, 1.0, 0.0))
    W = jnp.where(dead[:, None], 0.0, W)

    # static group params on original weights (gptq.py:91-100)
    scale_g, zero_g = find_params_weight(W, spec)  # (G, N)
    if scale_store_dtype is not None and not spec.per_channel:
        # Per-group scales are STORED narrow (bf16 by default from the
        # pipeline — the TPU analogue of the reference's fp16 s_group
        # buffer, qlinear_marlin.py:110-122).  Round here, BEFORE code
        # selection, so the column loop's error feedback compensates for
        # the storage rounding — the packed checkpoint then dequantizes
        # with exactly the scale GPTQ used.
        scale_g = scale_g.astype(scale_store_dtype).astype(jnp.float32)

    if actorder:
        perm = jnp.argsort(-jnp.diag(H))
        invperm = jnp.argsort(perm)
        W = W[perm, :]
        H = H[perm][:, perm]
    else:
        perm = jnp.arange(K)
        invperm = perm

    # per-row quant params through the permutation (gptq.py:144-148)
    row_group = perm // g  # (K,) group of each permuted row
    scale_rows = scale_g[row_group, :]  # (K, N)
    zero_rows = zero_g[row_group, :]

    Hinv = _cholesky_inv_chain(H, percdamp)

    maxq = spec.maxq
    sym_pc = spec.per_channel and spec.sym

    def quant_row(w, s, z):
        if sym_pc:
            q = jnp.clip(jnp.round(w / s), -maxq, maxq)
            return s * q, q
        q = jnp.clip(jnp.round(w / s) + z, 0, maxq)
        return s * (q - z), q - z  # signed code = q - zero

    nblocks = K // blocksize
    rows_in_blk = jnp.arange(blocksize)

    def block_step(Wb, Hinv_b, scale_b, zero_b):
        """Sequential quantization of one block (gptq.py:129-166)."""

        def step(carry, i):
            Wc = carry
            w = Wc[i]  # (N,)
            deq, code = quant_row(w, scale_b[i], zero_b[i])
            d = Hinv_b[i, i]
            err = (w - deq) / d
            hcol = Hinv_b[i, :]  # (128,)
            upd = hcol[:, None] * err[None, :]
            Wc = Wc - jnp.where((rows_in_blk > i)[:, None], upd, 0.0)
            loss = jnp.sum((w - deq) ** 2) / (d * d)
            return Wc, (deq, code, err, loss)

        _, (deq, code, err, loss) = jax.lax.scan(
            step, Wb, jnp.arange(blocksize)
        )
        return deq, code, err, loss

    Q_deq = jnp.zeros_like(W)
    Q_code = jnp.zeros((K, N), jnp.float32)
    total_loss = jnp.zeros((), jnp.float32)
    col_idx = jnp.arange(K)

    for b in range(nblocks):
        i1, i2 = b * blocksize, (b + 1) * blocksize
        Wb = jax.lax.dynamic_slice(W, (i1, 0), (blocksize, N))
        Hinv_b = jax.lax.dynamic_slice(Hinv, (i1, i1), (blocksize, blocksize))
        deq, code, err, loss = block_step(
            Wb, Hinv_b,
            jax.lax.dynamic_slice(scale_rows, (i1, 0), (blocksize, N)),
            jax.lax.dynamic_slice(zero_rows, (i1, 0), (blocksize, N)),
        )
        Q_deq = jax.lax.dynamic_update_slice(Q_deq, deq, (i1, 0))
        Q_code = jax.lax.dynamic_update_slice(Q_code, code, (i1, 0))
        total_loss = total_loss + jnp.sum(loss) / 2.0
        # trailing update W[i2:, :] -= Hinv[i1:i2, i2:]ᵀ · Err (gptq.py:168),
        # done full-width with the trailing columns masked
        Hrows = jax.lax.dynamic_slice(Hinv, (i1, 0), (blocksize, K))
        Hrows = jnp.where((col_idx >= i2)[None, :], Hrows, 0.0)
        W = W - Hrows.T @ err

    # un-permute (gptq.py:186-188)
    Q_deq = Q_deq[invperm, :]
    q4 = Q_code[invperm, :].astype(jnp.int8)
    return GPTQResult(
        w_deq=Q_deq, q4=q4, scale=scale_g, zero=zero_g, loss=total_loss
    )
