#!/bin/bash
# Round-3 measurement queue: re-measure the FULL bench_suite matrix with
# the honest timing body + jitter-robust marginal pairs, so BENCH_NOTES/
# README carry one self-consistent table (VERDICT r2 item 2).
# Each case is its own subprocess inside bench_suite.py already; this
# wrapper just sequences them and timestamps the log.
cd /root/repo
OUT=${1:-/tmp/suite_r3.jsonl}
: > "$OUT"
echo "== suite r3 start $(date -u +%FT%TZ) ==" >&2
timeout 240 python -u -c "import jax; print('devices', jax.devices())" \
    || { echo "RELAY DOWN" >&2; exit 1; }
for c in 2d_t2_256_200k 2d_t1_256_200k 2d_t1_256_65k \
         2d_t2_256_200k_b16_shared 2d_t1_256_200k_b16_shared \
         2d_t2_256_200k_b16_perbatch \
         3d_t2_128_800k 3d_t1_128_800k 3d_t1_128_1m \
         2d_t2_512_radial_b8 2d_t3_200k_200k \
         3d_t3_500k_500k 3d_t3_500k_500k_unplanned \
         cg_sense cg_sense_toeplitz; do
  echo "-- case $c $(date -u +%T) --" >&2
  timeout 4200 python bench_suite.py --case "$c" >> "$OUT" 2>/dev/null \
      || echo "{\"metric\": \"$c\", \"error\": \"rc=$? or timeout\"}" >> "$OUT"
done
echo "== suite r3 done $(date -u +%FT%TZ) ==" >&2
cat "$OUT"
