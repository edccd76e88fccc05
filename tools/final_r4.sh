#!/bin/bash
set -u
PREV_PID=$1
while kill -0 "$PREV_PID" 2>/dev/null; do sleep 30; done
cd "$(dirname "$0")/.."
echo "=== final_r4 starting $(date) ==="
set -x
timeout 2400 python bench_suite.py --case 3d_t3_500k_500k 2>&1
timeout 2400 python bench_suite.py --case 3d_t3_500k_500k_unplanned 2>&1
timeout 3000 python bench.py 2>&1
echo "== FINAL_R4 DONE =="
