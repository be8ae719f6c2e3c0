#!/usr/bin/env bash
# Canonical quantization recipes — parity with reference scripts/quant_model.sh.
# `--gptq_mse true` may overfit the calibration set; if quality regresses, set false.
set -euo pipefail

model_path=${MODEL_PATH:?set MODEL_PATH}
save_path=${SAVE_PATH:?set SAVE_PATH}
recipe=${1:-rotation_per_channel}

case "$recipe" in
  # rotation + gptq, per-channel (recommended first try)
  rotation_per_channel)
    python -m qqq_tpu.cli.quantize \
      --model_path "$model_path" --save_path "$save_path" \
      --rotate hadamard --w_group_size -1 --gptq_mse true \
      --calib_dataset wikitext2 --nsamples 128
    ;;
  # rotation + gptq, per-group g128
  rotation_g128)
    python -m qqq_tpu.cli.quantize \
      --model_path "$model_path" --save_path "$save_path" \
      --rotate hadamard --w_group_size 128 --gptq_mse true \
      --calib_dataset wikitext2 --nsamples 128
    ;;
  # smooth (OS+) + gptq, per-channel (no rotation; gptq_mse false pairs with smooth)
  smooth_per_channel)
    python -m qqq_tpu.cli.quantize \
      --model_path "$model_path" --save_path "$save_path" \
      --smooth_method os+ --w_group_size -1 --gptq_mse false \
      --calib_dataset wikitext2 --nsamples 128
    ;;
  # smooth (OS+) + gptq, per-group g128
  smooth_g128)
    python -m qqq_tpu.cli.quantize \
      --model_path "$model_path" --save_path "$save_path" \
      --smooth_method os+ --w_group_size 128 --gptq_mse false \
      --calib_dataset wikitext2 --nsamples 128
    ;;
  # rotation + gptq on a custom local dataset (txt or jsonl with "text" keys)
  custom_dataset)
    python -m qqq_tpu.cli.quantize \
      --model_path "$model_path" --save_path "$save_path" \
      --rotate hadamard --w_group_size -1 --gptq_mse true \
      --calib_dataset "${CUSTOM_DATASET:?set CUSTOM_DATASET}" --nsamples 128
    ;;
  *)
    echo "unknown recipe: $recipe" >&2; exit 1
    ;;
esac
