#!/usr/bin/env bash
# Round-3 serving batch ladder (VERDICT r2 item 2): reference protocol
# in 1024 / out 128, bs ∈ {1,4,16,64}, per-channel AND g128, w4a8 vs bf16.
#
# Same-layer-count pairs give the direct speedup ratio; the 32L w4a8 runs
# give honest absolute tok/s.  bs=64 needs 8 layers for bf16 KV+weights to
# fit 16 GB HBM (see bench_serving.py memory notes).  One precision/config
# per process: the tunneled runtime does not reclaim HBM in-process.
set -x
cd "$(dirname "$0")/.."
mkdir -p results
R=results

run() { # name, args...
  local name=$1; shift
  timeout 5400 python scripts/bench_serving.py "$@" \
      > "$R/ladder_$name.log" 2>&1
  tail -3 "$R/ladder_$name.log"
}

# --- per-channel ---
run w4a8_32L        --model llama2-7b --batches 1,4,16
run w4a8_16L        --model llama2-7b --batches 1,4,16 --layers 16
run bf16_16L        --model llama2-7b --batches 1,4,16 --layers 16 --mode bf16
run w4a8_8L_bs64    --model llama2-7b --batches 64 --layers 8
run bf16_8L_bs64    --model llama2-7b --batches 64 --layers 8 --mode bf16

# --- g128 ---
run g128_32L        --model llama2-7b --batches 1,4,16 --group-size 128
run g128_16L        --model llama2-7b --batches 1,4,16 --layers 16 --group-size 128
run g128_8L_bs64    --model llama2-7b --batches 64 --layers 8 --group-size 128

# --- scheduler features at bs=1 (revalidate queue step 4) ---
run feat_chunk      --model llama2-7b --batches 1 --prefill-chunk 512
run feat_spec       --model llama2-7b --batches 1 --spec-ngram 2 --spec-k 4
run feat_prefix     --model llama2-7b --batches 1 --prefill-chunk 512 --prefix-cache

# --- paged (revalidate queue step 5) ---
run paged_32L       --model llama2-7b --batches 1,4 --paged --block-size 128

echo LADDER_DONE
