#!/bin/bash
# Serial TPU measurement queue with tunnel-stall retries.
# Each command runs until success (exit 0) or MAX_TRIES; a watchdog inside
# the scripts exits 42 on tunnel stall, after which we cool down and retry
# (the backend reaps leaked sessions on a ~10-20 min horizon).
# Usage: scripts/run_tpu_queue.sh <queue-file> <log-dir>
# queue-file: one shell command per line (bash -c '...'), '#' comments ok.

set -u
QUEUE="$1"
LOGDIR="$2"
mkdir -p "$LOGDIR"
MAX_TRIES=${MAX_TRIES:-6}
COOLDOWN=${COOLDOWN:-420}

i=0
while IFS= read -r cmd; do
    case "$cmd" in ''|'#'*) continue;; esac
    i=$((i+1))
    log="$LOGDIR/q$(printf '%02d' $i).log"
    echo "=== [$i] $cmd" | tee -a "$log"
    ok=0
    for try in $(seq "$MAX_TRIES"); do
        echo "--- try $try $(date +%H:%M:%S)" | tee -a "$log"
        timeout 2700 bash -c "$cmd" >>"$log" 2>&1
        rc=$?
        echo "--- rc=$rc" | tee -a "$log"
        if [ $rc -eq 0 ]; then ok=1; break; fi
        sleep "$COOLDOWN"
    done
    [ $ok -eq 1 ] || echo "!!! [$i] FAILED after $MAX_TRIES tries" | tee -a "$log"
done < "$QUEUE"
echo "queue done"
