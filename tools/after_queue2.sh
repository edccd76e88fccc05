#!/bin/bash
# Second-stage TPU queue: b16 t1 stage split (round-4 matrix anomaly).
set -u
PREV_PID=$1
while kill -0 "$PREV_PID" 2>/dev/null; do sleep 60; done
cd "$(dirname "$0")/.."
echo "=== queue2 starting $(date) ==="
set -x
timeout 3600 python tools/probe_b16_t1.py 2>&1
echo "== QUEUE2 DONE =="
