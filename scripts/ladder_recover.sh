#!/usr/bin/env bash
# Resume the round-3 ladder after a tunnel outage: probe the TPU until a
# tiny dispatch completes, then run every config that has no recorded
# JSON line yet.  (The axon tunnel wedged mid-ladder at 03:42 — same
# failure mode as round 2's outage.)
set -x
cd "$(dirname "$0")/.."
R=results

probe() {
  timeout 120 python - <<'EOF'
import jax, jax.numpy as jnp
x = jnp.ones((8, 128))
print("probe:", float((x @ x.T).sum()))
EOF
}

until probe; do
  echo "$(date) tunnel still down"; sleep 300
done
echo "$(date) tunnel back — resuming ladder"

run() { local name=$1; shift
  # skip configs that already recorded a result
  if grep -q '^{' "$R/ladder2_$name.log" 2>/dev/null; then return; fi
  timeout 5400 python scripts/bench_serving.py "$@" \
      > "$R/ladder2_$name.log" 2>&1
  grep -E '^\{' "$R/ladder2_$name.log" | tail -2
}

# absolutes + missing pairs
run w4a8_32L_bs16  --model llama2-7b --batches 16 --prefill-batch 4
run g128_32L_bs16  --model llama2-7b --batches 16 --group-size 128 --prefill-batch 4
run g128_16L_bs4   --model llama2-7b --batches 4 --layers 16 --group-size 128
run g128_16L_bs16  --model llama2-7b --batches 16 --layers 16 --group-size 128
# bs=16 same-layer pairs at 8L, bs=64 at 4L (bf16 KV HBM limits)
run w4a8_8L_bs16   --model llama2-7b --batches 16 --layers 8
run bf16_8L_bs16   --model llama2-7b --batches 16 --layers 8 --mode bf16
run g128_8L_bs16   --model llama2-7b --batches 16 --layers 8 --group-size 128
run w4a8_4L_bs64   --model llama2-7b --batches 64 --layers 4
run bf16_4L_bs64   --model llama2-7b --batches 64 --layers 4 --mode bf16
run g128_4L_bs64   --model llama2-7b --batches 64 --layers 4 --group-size 128
# scheduler features + paged benches (revalidate queue steps 4-5)
run feat_chunk     --model llama2-7b --batches 1 --prefill-chunk 512
run feat_spec      --model llama2-7b --batches 1 --spec-ngram 2 --spec-k 4
run feat_prefix    --model llama2-7b --batches 1 --prefill-chunk 512 --prefix-cache
timeout 1800 python scripts/bench_paged_attention.py > "$R/ladder2_paged_attn.log" 2>&1
tail -5 "$R/ladder2_paged_attn.log"
run paged_32L_bs1  --model llama2-7b --batches 1 --paged --block-size 128
run paged_32L_bs4  --model llama2-7b --batches 4 --paged --block-size 128
echo LADDER2_RECOVERED_DONE
