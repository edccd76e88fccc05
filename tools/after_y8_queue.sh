#!/bin/bash
# Round-4 TPU follow-up queue: runs after the y8 sweep chain
# (tools/after_suite_y8.sh) exits. Single TPU proc at a time.
# Usage: nohup tools/after_y8_queue.sh Y8_PID > tools/queue_r4.log 2>&1 &
set -u
Y8_PID=$1
while kill -0 "$Y8_PID" 2>/dev/null; do sleep 60; done
cd "$(dirname "$0")/.."
echo "=== y8 chain done; follow-up queue starting $(date) ==="
set -x
# Multicoil post-fix width sweep (VERDICT r3 item 3 stage evidence).
timeout 7300 python tools/chan_group.py 2>&1
# Big-M fast/sort crossover + additivity on hardware (item 4).
timeout 3600 python tools/probe_bigm.py 2>&1
# 3D accuracy attribution (item 5); cheap now that the f64 refs and
# compile cache are warm.
true  # census passed at 1.05x the f32 floor - bisect moot
echo "== QUEUE_R4 DONE =="
