#!/bin/bash
# Watch for the TPU backend to come back from an 'Unavailable' phase, then
# run the serialized pending-job batch (benchmarks/chip_window.py) exactly
# once.  Probes are fresh bounded subprocesses (a failed in-process init is
# sticky, CLAUDE.md); one watcher at a time keeps all TPU work serialized.
set -u
cd "$(dirname "$0")/.."
LOG=benchmarks/chip_watch.log
DEADLINE=$(( $(date +%s) + ${1:-36000} ))  # default: give up after 10 h

echo "==== chip_watch start $(date '+%F %T') ====" >> "$LOG"
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
    if timeout 600 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
        echo "backend up $(date '+%F %T'); running chip_window" >> "$LOG"
        python benchmarks/chip_window.py >> "$LOG" 2>&1
        echo "==== chip_watch done rc=$? $(date '+%F %T') ====" >> "$LOG"
        exit 0
    fi
    echo "probe failed $(date '+%F %T'); retry in 300s" >> "$LOG"
    sleep 300
done
echo "==== chip_watch gave up $(date '+%F %T') ====" >> "$LOG"
exit 1
