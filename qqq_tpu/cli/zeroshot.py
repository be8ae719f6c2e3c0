"""Zero-shot multiple-choice harness for the reference's five tasks.

The reference runs these through lm_eval==0.4.2 (eval_model.py:100-116);
this is a self-contained re-implementation of the same scoring protocol:
for each candidate continuation, sum log p(continuation | context) under the
model, normalize per lm_eval's "acc" convention (raw loglikelihood argmax)
plus "acc_norm" (byte-length normalized), and report accuracy.

Task formats follow the lm_eval task definitions:
  piqa:          "Question: {goal}\\nAnswer:" + " {sol}"
  arc_easy/challenge: "Question: {q}\\nAnswer:" + " {choice}"
  hellaswag:     ctx + " {ending}" (with lm_eval's text preprocessing)
  winogrande:    sentence split at "_": partial-context scoring
"""

from __future__ import annotations

import logging
import re
from typing import Dict, List

import numpy as np

logger = logging.getLogger("qqq_tpu")


def _hellaswag_preprocess(text: str) -> str:
    text = text.strip()
    text = text.replace(" [title]", ". ")
    text = re.sub("\\[.*?\\]", "", text)
    text = text.replace("  ", " ")
    return text


def _load_task(name: str, limit: int, split: str = "validation"):
    """Yields (context, [choices], gold_idx)."""
    from datasets import load_dataset

    if name == "piqa":
        ds = load_dataset("piqa", split=split)
        for i, ex in enumerate(ds):
            if limit and i >= limit:
                break
            yield (
                f"Question: {ex['goal']}\nAnswer:",
                [" " + ex["sol1"], " " + ex["sol2"]],
                ex["label"],
            )
    elif name in ("arc_easy", "arc_challenge"):
        sub = "ARC-Easy" if name == "arc_easy" else "ARC-Challenge"
        ds = load_dataset("allenai/ai2_arc", sub, split=split)
        for i, ex in enumerate(ds):
            if limit and i >= limit:
                break
            labels = ex["choices"]["label"]
            if ex["answerKey"] not in labels:
                continue
            yield (
                f"Question: {ex['question']}\nAnswer:",
                [" " + t for t in ex["choices"]["text"]],
                labels.index(ex["answerKey"]),
            )
    elif name == "hellaswag":
        ds = load_dataset("hellaswag", split=split)
        for i, ex in enumerate(ds):
            if limit and i >= limit:
                break
            ctx = ex["ctx_a"] + " " + ex["ctx_b"].capitalize()
            query = _hellaswag_preprocess(ex["activity_label"] + ": " + ctx)
            yield (
                query,
                [" " + _hellaswag_preprocess(e) for e in ex["endings"]],
                int(ex["label"]),
            )
    elif name == "winogrande":
        ds = load_dataset("winogrande", "winogrande_xl", split=split)
        for i, ex in enumerate(ds):
            if limit and i >= limit:
                break
            idx = ex["sentence"].index("_")
            # lm_eval scores the shared suffix under each option-context
            yield (
                ("winogrande", ex["sentence"], idx),
                [ex["option1"], ex["option2"]],
                int(ex["answer"]) - 1,
            )
    else:
        raise ValueError(f"unknown task {name!r}")


def _example_text(ctx, choices, gold) -> str:
    """Render one solved example for a few-shot prefix (lm_eval's
    fewshot_context: doc text + gold continuation)."""
    if isinstance(ctx, tuple) and ctx[0] == "winogrande":
        _, sentence, idx = ctx
        return (
            sentence[:idx].strip() + " " + choices[gold]
            + sentence[idx + 1:]
        )
    return ctx + choices[gold]


def fewshot_prefix(task: str, k: int, seed: int = 1234) -> str:
    """k solved TRAIN-split examples joined by the lm_eval delimiter
    "\\n\\n" (eval_model.py:110-116 passes num_fewshot to lm_eval; lm_eval
    0.4.2 samples fewshot docs from the training split, rnd seed 1234)."""
    if k <= 0:
        return ""
    import random as _random

    examples = list(_load_task(task, limit=max(200, 5 * k), split="train"))
    rnd = _random.Random(seed)
    rnd.shuffle(examples)
    shots = examples[:k]
    return "\n\n".join(_example_text(*ex) for ex in shots) + "\n\n"


def run_tasks(
    params, config, tokenizer_path: str, tasks: List[str], limit: int = 0,
    num_fewshot: int = 0,
) -> Dict[str, float]:
    from transformers import AutoTokenizer

    from qqq_tpu.utils.eval import loglikelihood_batch

    tok = AutoTokenizer.from_pretrained(tokenizer_path, use_fast=False)
    results: Dict[str, float] = {}
    for task in tasks:
        task = task.strip()
        try:
            examples = list(_load_task(task, limit))
            prefix = fewshot_prefix(task, num_fewshot)
        except Exception as e:
            logger.warning("task %s unavailable (%s); skipping", task, e)
            continue
        # tokenize all (context, choice) pairs up front and score them in
        # padded batches — one compile per length bucket instead of one
        # eager forward per choice
        pairs, meta = [], []
        for ex_i, (ctx, choices, gold) in enumerate(examples):
            for choice in choices:
                if isinstance(ctx, tuple) and ctx[0] == "winogrande":
                    _, sentence, idx = ctx
                    context = prefix + sentence[:idx].strip() + " " + choice
                    cont_text = sentence[idx + 1 :]
                    c_toks = tok(context).input_ids
                else:
                    cont_text = choice
                    c_toks = tok(prefix + ctx).input_ids
                t_toks = tok(cont_text, add_special_tokens=False).input_ids
                pairs.append((c_toks, t_toks))
                meta.append((ex_i, len(cont_text)))
        scored = loglikelihood_batch(params, config, pairs)

        n_ex = len(examples)
        lls = [[] for _ in range(n_ex)]
        lls_norm = [[] for _ in range(n_ex)]
        for (ex_i, clen), (ll, _) in zip(meta, scored):
            lls[ex_i].append(ll)
            lls_norm[ex_i].append(ll / max(clen, 1))
        acc = sum(
            int(int(np.argmax(l)) == ex[2])
            for l, ex in zip(lls, examples)
        )
        acc_norm = sum(
            int(int(np.argmax(l)) == ex[2])
            for l, ex in zip(lls_norm, examples)
        )
        if n_ex:
            results[f"{task}_acc"] = round(acc / n_ex, 4)
            results[f"{task}_acc_norm"] = round(acc_norm / n_ex, 4)
            logger.info("%s: acc=%.4f acc_norm=%.4f (n=%d)",
                        task, acc / n_ex, acc_norm / n_ex, n_ex)
    return results
