#!/bin/bash
# Block until the axon TPU tunnel answers a real round-trip (compile +
# execute + FETCH — jax.devices() alone can succeed while execution is
# dead, and block_until_ready lies over the tunnel).  Probes every 2 min.
# Used by the relaunch lanes after the 2026-08-18 tunnel outage killed
# every TPU-backed run mid-flight.
set -u
cd "$(dirname "$0")/.."
while true; do
  if timeout 240 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
print('tpu up:', float((x @ x).sum()), jax.devices())
" 2>/dev/null; then
    break
  fi
  echo "tpu still down $(date -u +%H:%M:%S)"
  sleep 120
done
