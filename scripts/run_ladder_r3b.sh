#!/usr/bin/env bash
# Round-3 serving batch ladder, take 2 — after the logits_at prefill fix
# (final-position lm_head: −2.1 GB peak + faster TTFT) and the engine
# data>1/speculative work.  Reference protocol: in 1024 / out 128,
# bs ∈ {1,4,16,64}, per-channel AND g128, w4a8 vs bf16 (same-layer pairs
# give the ratio; 32L w4a8 gives honest absolutes).
#
# ONE (precision, batch) per process: the tunneled runtime does not
# reclaim a released engine's HBM within a process, so chaining batches
# in one process OOMs by bs=16 (observed: the leftover bs=1/4 engines
# exhaust the pool before the bs=16 engine allocates).
set -x
cd "$(dirname "$0")/.."
mkdir -p results
R=results

run() { # name, args...
  local name=$1; shift
  timeout 5400 python scripts/bench_serving.py "$@" \
      > "$R/ladder2_$name.log" 2>&1
  grep -E '^\{' "$R/ladder2_$name.log" | tail -2
}

# --- per-channel ---
for bs in 1 4 16; do
  run w4a8_32L_bs$bs  --model llama2-7b --batches $bs
  run w4a8_16L_bs$bs  --model llama2-7b --batches $bs --layers 16
  run bf16_16L_bs$bs  --model llama2-7b --batches $bs --layers 16 --mode bf16
done
run w4a8_8L_bs64    --model llama2-7b --batches 64 --layers 8
run bf16_8L_bs64    --model llama2-7b --batches 64 --layers 8 --mode bf16

# --- g128 ---
for bs in 1 4 16; do
  run g128_32L_bs$bs  --model llama2-7b --batches $bs --group-size 128
  run g128_16L_bs$bs  --model llama2-7b --batches $bs --layers 16 --group-size 128
done
run g128_8L_bs64    --model llama2-7b --batches 64 --layers 8 --group-size 128

# --- scheduler features at bs=1 (revalidate queue step 4) ---
run feat_chunk      --model llama2-7b --batches 1 --prefill-chunk 512
run feat_spec       --model llama2-7b --batches 1 --spec-ngram 2 --spec-k 4
run feat_prefix     --model llama2-7b --batches 1 --prefill-chunk 512 --prefix-cache

# --- paged (revalidate queue step 5) ---
timeout 1800 python scripts/bench_paged_attention.py > "$R/ladder2_paged_attn.log" 2>&1
tail -5 "$R/ladder2_paged_attn.log"
for bs in 1 4; do
  run paged_32L_bs$bs --model llama2-7b --batches $bs --paged --block-size 128
done

echo LADDER2_DONE
