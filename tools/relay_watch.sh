#!/bin/bash
# Watch for the axon TPU relay to come back; when it does, run the
# measurement queue (tools/tpu_queue.sh). Probe is timeout-wrapped
# (an outage HANGS, never raises — see CLAUDE.md). The queue gets up
# to 3 attempts: its opening probe can hit a transient compile-service
# flake right after the relay returns. Log: /tmp/relay_watch.log
cd /root/repo
LOG=/tmp/relay_watch.log
QLOG=/tmp/tpu_queue.log
ATTEMPTS=0
echo "[relay_watch] start $(date -u +%FT%TZ)" >> "$LOG"
while true; do
  if timeout 240 python -u -c "import jax, jax.numpy as jnp; print('devices', jax.devices()); print(float(jnp.sum(jnp.arange(8.0))))" >> "$LOG" 2>&1; then
    ATTEMPTS=$((ATTEMPTS + 1))
    echo "[relay_watch] RELAY UP $(date -u +%FT%TZ) — queue attempt $ATTEMPTS" >> "$LOG"
    bash tools/tpu_queue.sh > "$QLOG.$ATTEMPTS" 2>&1
    rc=$?
    echo "[relay_watch] queue attempt $ATTEMPTS done rc=$rc $(date -u +%FT%TZ)" >> "$LOG"
    if [ "$rc" -eq 0 ] || [ "$ATTEMPTS" -ge 3 ]; then
      cp "$QLOG.$ATTEMPTS" "$QLOG" 2>/dev/null
      exit 0
    fi
    sleep 120
  else
    echo "[relay_watch] still down $(date -u +%FT%TZ)" >> "$LOG"
    sleep 240
  fi
done
