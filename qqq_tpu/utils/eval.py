"""Quality evaluation: WikiText2-style perplexity + log-likelihood scoring.

PPL mirrors reference examples/eval_model.py:49-98 exactly: slice the test
encoding into non-overlapping ``seqlen`` windows, model forward, shifted
cross-entropy, ``exp(Σ nll / (nsamples · seqlen))``.

``loglikelihood`` is the scoring primitive for zero-shot tasks (the
reference delegates to lm_eval==0.4.2, eval_model.py:100-116; our harness in
cli/zeroshot.py uses this primitive with HF ``datasets`` task adapters).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qqq_tpu.models.config import ModelConfig
from qqq_tpu.models import llama as M


@functools.partial(jax.jit, static_argnames=("config",))
def _window_nll(params, config: ModelConfig, tokens: jax.Array) -> jax.Array:
    """Σ shifted cross-entropy over one (B, T) window (eval_model.py:85-95)."""
    logits, _ = M.forward(params, config, tokens)
    logp = jax.nn.log_softmax(logits[:, :-1, :], axis=-1)
    tgt = tokens[:, 1:]
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return jnp.sum(nll)


def perplexity(
    params: Dict[str, Any],
    config: ModelConfig,
    test_tokens: np.ndarray,  # (N,) int32 flat encoding
    *,
    seqlen: int = 2048,
    max_windows: int = 0,
    batch: int = 1,
) -> float:
    n_windows = test_tokens.shape[0] // seqlen
    if max_windows:
        n_windows = min(n_windows, max_windows)
    total = 0.0
    for b0 in range(0, n_windows, batch):
        rows = [
            test_tokens[i * seqlen : (i + 1) * seqlen]
            for i in range(b0, min(b0 + batch, n_windows))
        ]
        tok = jnp.asarray(np.stack(rows).astype(np.int32))
        total += float(_window_nll(params, config, tok))
    # normalization matches eval_model.py:97: nlls are per shifted position,
    # divided by nsamples * seqlen
    return float(np.exp(total / (n_windows * (seqlen - 1))))


def loglikelihood(
    params: Dict[str, Any],
    config: ModelConfig,
    context: Sequence[int],
    continuation: Sequence[int],
) -> Tuple[float, bool]:
    """(logprob of continuation given context, is_greedy) — the lm_eval
    scoring contract for multiple-choice zero-shot tasks."""
    ll, greedy = loglikelihood_batch(
        params, config, [(list(context), list(continuation))]
    )[0]
    return ll, greedy


@functools.partial(jax.jit, static_argnames=("config",))
def _score_batch(params, config: ModelConfig, tokens, ctx_len, total_len):
    """Σ log p(continuation) per row: positions [ctx_len−1, total_len−1)
    predicting tokens[pos+1], via masking (padded batch, one compile per
    bucket shape)."""
    logits, _ = M.forward(params, config, tokens)
    logp = jax.nn.log_softmax(logits[:, :-1, :].astype(jnp.float32), axis=-1)
    tgt = tokens[:, 1:]
    tok_lp = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    pos = jnp.arange(tokens.shape[1] - 1, dtype=jnp.int32)[None, :]
    mask = (pos >= ctx_len[:, None] - 1) & (pos < total_len[:, None] - 1)
    ll = jnp.sum(jnp.where(mask, tok_lp, 0.0), axis=1)
    greedy_tok = jnp.argmax(logp, axis=-1)
    all_greedy = jnp.all(
        jnp.where(mask, greedy_tok == tgt, True), axis=1
    )
    return ll, all_greedy


def loglikelihood_batch(
    params: Dict[str, Any],
    config: ModelConfig,
    pairs: Sequence[Tuple[Sequence[int], Sequence[int]]],
    *,
    batch_size: int = 8,
    buckets: Sequence[int] = (64, 128, 256, 512, 1024, 2048),
) -> list:
    """Batched scoring: requests are grouped into padded length buckets so
    each (bucket, batch) shape compiles once.  Returns [(ll, is_greedy)] in
    input order."""
    items = []
    for idx, (ctx, cont) in enumerate(pairs):
        toks = list(ctx) + list(cont)
        bucket = next((b for b in buckets if len(toks) <= b), None)
        if bucket is None:
            toks = toks[-buckets[-1]:]  # left-truncate like lm_eval
            bucket = buckets[-1]
        items.append((bucket, idx, toks, len(ctx), len(toks)))

    results: list = [None] * len(pairs)
    by_bucket: Dict[int, list] = {}
    for it in items:
        by_bucket.setdefault(it[0], []).append(it)
    for bucket, group in by_bucket.items():
        for i0 in range(0, len(group), batch_size):
            chunk = group[i0 : i0 + batch_size]
            B = batch_size  # fixed batch shape → one compile per bucket
            toks = np.zeros((B, bucket), np.int32)
            ctx_len = np.full((B,), 2, np.int32)
            total_len = np.full((B,), 2, np.int32)
            for r, (_, _, t, cl, tl) in enumerate(chunk):
                toks[r, : len(t)] = t
                ctx_len[r] = cl
                total_len[r] = tl
            ll, greedy = _score_batch(
                params, config, jnp.asarray(toks), jnp.asarray(ctx_len),
                jnp.asarray(total_len),
            )
            ll, greedy = np.asarray(ll), np.asarray(greedy)
            for r, (_, idx, _, _, _) in enumerate(chunk):
                results[idx] = (float(ll[r]), bool(greedy[r]))
    return results
