#!/bin/bash
# Watch for the axon TPU relay to come back; when it does, run the
# measurement queue (tools/tpu_queue.sh) once. Probe is timeout-wrapped
# (an outage HANGS, never raises — see CLAUDE.md). Log: /tmp/relay_watch.log
cd /root/repo
LOG=/tmp/relay_watch.log
QLOG=/tmp/tpu_queue.log
echo "[relay_watch] start $(date -u +%FT%TZ)" >> "$LOG"
while true; do
  if timeout 120 python -u -c "import jax, jax.numpy as jnp; print('devices', jax.devices()); print(float(jnp.sum(jnp.arange(8.0))))" >> "$LOG" 2>&1; then
    echo "[relay_watch] RELAY UP $(date -u +%FT%TZ) — running queue" >> "$LOG"
    bash tools/tpu_queue.sh > "$QLOG" 2>&1
    echo "[relay_watch] queue done rc=$? $(date -u +%FT%TZ)" >> "$LOG"
    exit 0
  fi
  echo "[relay_watch] still down $(date -u +%FT%TZ)" >> "$LOG"
  sleep 240
done
