#!/bin/bash
# Run a python script on the TPU with claim-retry.
# The axon tunnel admits one process at a time and a claim can hang
# indefinitely if a previous grant is stale; probe with a short-lived
# process until a claim succeeds, then immediately run the payload.
# usage: tpu_run.sh <script.py> <output-file> [timeout-seconds]
set -u
SCRIPT="$1"; OUT="$2"; TMO="${3:-540}"
for i in $(seq 1 12); do
  if timeout 75 python -c "import jax, jax.numpy as j; j.numpy if 0 else None; import jax.numpy as jnp; print(float(jnp.ones(2).sum()))" >/dev/null 2>&1; then
    echo "[tpu_run] claim probe ok (attempt $i)" >> "$OUT"
    break
  fi
  echo "[tpu_run] claim probe failed (attempt $i), waiting" >> "$OUT"
  sleep 45
done
exec timeout "$TMO" python -u "$SCRIPT" >> "$OUT" 2>&1
