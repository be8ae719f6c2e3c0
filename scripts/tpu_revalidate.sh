#!/usr/bin/env bash
# TPU re-validation queue (STATUS.md "Open for next rounds" #4).
# Round 2's axon tunnel wedged ~7h in; everything below re-measures the
# work that landed after the outage on the real chip.  Each step is
# independent — run what the clock allows, in this order of value.
set -x

cd "$(dirname "$0")/.."

# 1. Headline decode (the driver also runs this): honest 32-layer methodology
timeout 3600 python bench.py --verbose

# 2. g128 prefill with the requant kernel (auto at M >= 512) + prefill mode
timeout 3600 python bench.py --group-size 128 --prefill --verbose

# 3. Requant auto block-pick confirmation at the four Llama-7B shapes
#    (expected ~332-340 TOPS requant vs 264-286 exact; swept numbers in
#    kernels/w4a8_gemm.py docstrings).  Script preserved from the sweep:
[ -f /tmp/drive_requant_tpu_sweep.py ] && \
    timeout 1800 python /tmp/drive_requant_tpu_sweep.py

# 4. Serving-protocol numbers (reference protocol in1024/out128), one
#    precision per process (HBM not reclaimed in-process — CLAUDE.md):
timeout 3600 python scripts/bench_serving.py --model llama2-7b --batches 1,4
timeout 3600 python scripts/bench_serving.py --model llama2-7b --batches 1 \
    --prefill-chunk 512
timeout 3600 python scripts/bench_serving.py --model llama2-7b --batches 1 \
    --spec-ngram 2 --spec-k 4
timeout 3600 python scripts/bench_serving.py --model llama2-7b --batches 1 \
    --prefill-chunk 512 --prefix-cache

# 5. Round-2 additions: paged-KV attention kernel overhead vs contiguous,
#    and paged-engine serving throughput (block tables, preemption off —
#    pool sized to fit; add --num-blocks to exercise preemption)
timeout 1800 python scripts/bench_paged_attention.py
timeout 3600 python scripts/bench_serving.py --model llama2-7b --batches 1,4 \
    --paged --block-size 128
