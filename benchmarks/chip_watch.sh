#!/bin/bash
# Watch for the TPU backend to come back from an 'Unavailable' phase, then
# run the serialized pending-job batch (benchmarks/chip_window.py) until it
# COMPLETES with no failures — looping with backoff across chip outages.
# (Round 3 lost an entire measurement window because this script exited
# after one failed probe; it must persist until the batch is done.)
# Probes are fresh bounded subprocesses (a failed in-process init is
# sticky, CLAUDE.md); one watcher at a time keeps all TPU work serialized.
set -u
cd "$(dirname "$0")/.."
LOG=benchmarks/chip_watch.log
DEADLINE=$(( $(date +%s) + ${1:-36000} ))  # default: give up after 10 h
ARGS="${2:-}"                              # extra args for chip_window.py

echo "==== chip_watch start $(date '+%F %T') args='$ARGS' ====" >> "$LOG"
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
    if timeout 600 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
        echo "backend up $(date '+%F %T'); running chip_window" >> "$LOG"
        # shellcheck disable=SC2086
        python benchmarks/chip_window.py $ARGS >> "$LOG" 2>&1
        rc=$?
        echo "==== chip_window rc=$rc $(date '+%F %T') ====" >> "$LOG"
        if [ "$rc" -eq 0 ]; then
            echo "==== chip_watch done $(date '+%F %T') ====" >> "$LOG"
            exit 0
        fi
        # Batch incomplete (mid-window outage or job failure): chip_window
        # keeps a completed-jobs ledger (.chip_window_done), so the retry
        # reruns only the jobs that did not finish.
        echo "batch incomplete; backoff 600s then re-probe" >> "$LOG"
        sleep 600
    else
        echo "probe failed $(date '+%F %T'); retry in 300s" >> "$LOG"
        sleep 300
    fi
done
echo "==== chip_watch gave up $(date '+%F %T') ====" >> "$LOG"
exit 1
