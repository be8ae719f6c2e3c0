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
    toks = jnp.asarray([list(context) + list(continuation)], jnp.int32)
    logits, _ = M.forward(params, config, toks)
    logp = jax.nn.log_softmax(logits[0, :-1, :], axis=-1)
    start = len(context) - 1
    cont = jnp.asarray(list(continuation), jnp.int32)
    sel = logp[start : start + len(continuation)]
    ll = jnp.sum(jnp.take_along_axis(sel, cont[:, None], axis=-1))
    greedy = bool(jnp.all(jnp.argmax(sel, axis=-1) == cont))
    return float(ll), greedy
