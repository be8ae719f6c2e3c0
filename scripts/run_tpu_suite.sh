#!/bin/bash
# On-TPU test suite with tunnel-flake retries (VERDICT r3 #3).
#
# The tunneled runtime intermittently fails compiles (remote_compile HTTP
# 500) or loses env (TPU_WORKER_HOSTNAMES) — infra flakes, not code bugs.
# Run the full suite once, then re-run ONLY the failures (pytest --lf) up
# to RETRIES times; the suite is green when a (re)run reports 0 failed.
# Single process: the tests share one chip — no xdist here (the CPU
# suite's segfault workaround does not apply on TPU where each test's
# compile goes through the remote service).
#
# Usage: scripts/run_tpu_suite.sh [logfile]

set -u
LOG="${1:-results/tpu_suite_r4.log}"
RETRIES=${RETRIES:-2}
cd "$(dirname "$0")/.."
mkdir -p "$(dirname "$LOG")"

echo "== TPU suite $(date -u +%FT%TZ) HEAD=$(git rev-parse --short HEAD)" | tee "$LOG"
QQQ_TPU_TEST_PLATFORM=tpu python -m pytest tests/ -q 2>&1 | tail -40 | tee -a "$LOG"
rc=${PIPESTATUS[0]}

for i in $(seq "$RETRIES"); do
    [ "$rc" -eq 0 ] && break
    echo "== retry $i (failures only, $(date -u +%T)) — tunnel-flake pass" | tee -a "$LOG"
    sleep 120
    QQQ_TPU_TEST_PLATFORM=tpu python -m pytest tests/ -q --lf 2>&1 | tail -40 | tee -a "$LOG"
    rc=${PIPESTATUS[0]}
done

echo "== final rc=$rc $(date -u +%FT%TZ)" | tee -a "$LOG"
exit "$rc"
