#!/bin/bash
# Chains the round-4 y8 banded-geometry sweep behind the running
# bench_suite (single TPU proc at a time — see CLAUDE.md). Usage:
#   nohup tools/after_suite_y8.sh SUITE_PID > tools/sweep_y8.log 2>&1 &
set -u
SUITE_PID=$1
while kill -0 "$SUITE_PID" 2>/dev/null; do
    sleep 60
done
echo "=== suite (pid $SUITE_PID) done; starting y8 sweep $(date) ==="
cd "$(dirname "$0")/.."
# cfg7 (256,8,64) is the cost model's winner — run it first so the
# key datum lands even if the relay dies mid-sweep; cfg3 is the
# current-default control (also covered by the suite's 3d_t1 row).
exec python tools/sweep3d_banded.py --only 7,6,8,3
