#!/bin/bash
# Sequential TPU measurement queue (run after a relay outage ends).
# Every step timeout-wrapped: zero output => relay down (see CLAUDE.md).
cd /root/repo
set -x
timeout 240 python -u -c "import jax, jax.numpy as jnp; print('devices', jax.devices()); print(float(jnp.sum(jnp.arange(8.0))))" || exit 1
timeout 1800 python tools/tpu_t3_check.py                 2>&1
timeout 900  python tools/vpb_variants.py                 2>&1
timeout 1800 python bench.py                              2>&1
timeout 7300 python tools/chan_group.py                   2>&1
# Honest re-measurement of the suite rows recorded pre-honest-timing:
for c in 2d_t2_256_200k 2d_t1_256_200k_b16_shared 2d_t2_256_200k_b16_shared \
         2d_t2_512_radial_b8 2d_t3_200k_200k cg_sense cg_sense_toeplitz \
         3d_t1_128_800k; do
  # Keep stderr: it carries the backend line + accuracy/timing detail,
  # and a crashed case must be distinguishable from a down relay.
  timeout 4200 python bench_suite.py --case "$c" 2>&1
done
echo "== QUEUE DONE =="
