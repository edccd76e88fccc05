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
exec python tools/sweep3d_banded.py --only 6,7,8,3
