#!/usr/bin/env bash
# Evaluation recipe — parity with reference scripts/eval_model.sh:
# WikiText2 PPL + the five-task zero-shot suite.
set -euo pipefail
model_path=${MODEL_PATH:?set MODEL_PATH}

python -m qqq_tpu.cli.eval \
  --model_path "$model_path" \
  --eval_ppl \
  --tasks piqa,arc_easy,arc_challenge,hellaswag,winogrande \
  --max_length 2048
