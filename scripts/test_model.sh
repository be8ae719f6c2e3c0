#!/usr/bin/env bash
# Generation smoke test — parity with reference scripts/test_model.sh.
set -euo pipefail
model_path=${MODEL_PATH:?set MODEL_PATH}

python -m qqq_tpu.cli.generate \
  --model_path "$model_path" \
  --prompt "The capital of France is" \
  --max_new_tokens 64
