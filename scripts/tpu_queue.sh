#!/bin/bash
# One-chip work queue: wait for the flagship supervisor (pid in
# /tmp/bbh.pid) to finish, then run the burst ELBO-selection sweeps.
# Each sweep is bounded (tunnel wedges hang silently) and retried once
# after a device-health wait; failures move on so one sick variant
# cannot starve the rest. Usage: nohup bash scripts/tpu_queue.sh &
set -u
cd "$(dirname "$0")/.."

while kill -0 "$(cat /tmp/bbh.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done
echo "[queue] flagship done; starting burst sweeps" >&2

health_wait() {
  for _ in $(seq 1 60); do
    if timeout 90 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((256, 256)); print(float(np.asarray((x @ x).sum())))" \
        >/dev/null 2>&1; then
      return 0
    fi
    sleep 60
  done
  return 1
}

for variant in mlrc_sel mlrc_sel_frz; do
  for seed in 0 1 2; do
    for attempt in 1 2; do
      echo "[queue] $variant s$seed attempt $attempt" >&2
      health_wait
      if timeout 3600 python scripts/burst_sweep.py "$variant" "$seed" 50000; then
        break
      fi
      echo "[queue] $variant s$seed attempt $attempt failed" >&2
    done
  done
done
echo "[queue] all sweeps done" >&2
