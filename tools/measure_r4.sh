#!/bin/bash
# Round-4 re-measurement after a 3D geometry adoption: only the rows
# the geometry change can move (3D + headline cross-check). Run AFTER
# tools/suite_r4.jsonl has the full matrix and the y8 sweep picked a
# winner. Sequential; timeout-wrapped (zero output => relay down).
cd /root/repo
set -x
timeout 240 python -u -c "import jax; print('devices', jax.devices())" || exit 1
for c in 3d_t3_500k_500k 3d_t3_500k_500k_unplanned \
         3d_t1_128_800k 3d_t2_128_800k 3d_t1_128_1m \
         3d_t1_128_800k_slots 3d_t2_128_800k_slots 3d_census_128_800k; do
  timeout 4200 python bench_suite.py --case "$c" 2>&1
done
timeout 1800 python bench.py 2>&1
echo "== MEASURE_R4 DONE =="
