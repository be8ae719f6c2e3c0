#!/usr/bin/env bash
# Round-3 serving batch ladder, take 2 — after the logits_at prefill fix
# (final-position lm_head: −2.1 GB peak + faster TTFT) and the engine
# data>1/speculative work.  Reference protocol: in 1024 / out 128,
# bs ∈ {1,4,16,64}, per-channel AND g128, w4a8 vs bf16 (same-layer pairs
# give the ratio; 32L w4a8 gives honest absolutes).
set -x
cd "$(dirname "$0")/.."
mkdir -p results
R=results

run() { # name, args...
  local name=$1; shift
  timeout 5400 python scripts/bench_serving.py "$@" \
      > "$R/ladder2_$name.log" 2>&1
  grep -E '^\{' "$R/ladder2_$name.log" | tail -4
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
timeout 1800 python scripts/bench_paged_attention.py > "$R/ladder2_paged_attn.log" 2>&1
tail -5 "$R/ladder2_paged_attn.log"
run paged_32L       --model llama2-7b --batches 1,4 --paged --block-size 128

echo LADDER2_DONE
