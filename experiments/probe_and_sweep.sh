#!/bin/bash
# Waits for the axon TPU worker to answer a sanity op, then runs the queued
# round-3 sweep (experiments/r3_sweep.sh). NEVER kills a probe mid-RPC: each
# probe python process is left to finish or fail on its own (a hung backend
# init errors out by itself after ~35 min — STATUS.md backend incident).
set -u
cd "$(dirname "$0")/.."
SWEEP="${1:-experiments/r3_sweep.sh}"
LOG=experiments/probe_and_sweep.log
echo "=== probe loop start $(date)" >> "$LOG"
while true; do
  python - <<'EOF' >> "$LOG" 2>&1
import jax, numpy as np, jax.numpy as jnp
print("devices:", jax.devices(), flush=True)
x = jnp.asarray(np.random.rand(4096).astype("float32"))
print("sanity sum:", float((x * 2).sum()), flush=True)
EOF
  if [ $? -eq 0 ]; then break; fi
  echo "probe failed $(date); retry in 300s" >> "$LOG"
  sleep 300
done
echo "=== TPU up $(date); starting $SWEEP" >> "$LOG"
bash "$SWEEP" >> "$LOG" 2>&1
echo "=== sweep finished $(date)" >> "$LOG"
