#!/usr/bin/env bash
# Follow-up pairs for the bs=16/64 points: bf16 KV at 16 GB HBM forces
# smaller layer counts (bf16 16L@bs16 = 17.5 GB, bf16 8L@bs64 = 14.1 GB +
# activations — both OOM'd).  The speedup ratio is layer-count invariant
# up to the constant lm_head/sampling term, so same-layer pairs at 8L/4L
# carry the bs=16/64 comparison.
set -x
cd "$(dirname "$0")/.."
R=results

run() { local name=$1; shift
  timeout 5400 python scripts/bench_serving.py "$@" \
      > "$R/ladder2_$name.log" 2>&1
  grep -E '^\{' "$R/ladder2_$name.log" | tail -2
}

run w4a8_8L_bs16   --model llama2-7b --batches 16 --layers 8
run bf16_8L_bs16   --model llama2-7b --batches 16 --layers 8 --mode bf16
run g128_8L_bs16   --model llama2-7b --batches 16 --layers 8 --group-size 128
run w4a8_4L_bs64   --model llama2-7b --batches 64 --layers 4
run bf16_4L_bs64   --model llama2-7b --batches 64 --layers 4 --mode bf16
run g128_4L_bs64   --model llama2-7b --batches 64 --layers 4 --group-size 128
echo LADDER2C_DONE
