#!/bin/bash
# Round-3 session-3 TPU queue: graveyard-deposit A/B + mode refresh +
# interactive latency. Run from the repo root; let every job FINISH
# (killing a client mid-RPC wedges the TPU worker — CLAUDE.md).
set -u
cd "$(dirname "$0")/.."
LOG=experiments/r3b_sweep.log
run() {
  local tag="$1"; shift
  echo "=== $tag $(date +%H:%M:%S)" | tee -a "$LOG"
  env "$@" python bench.py 2>&1 | grep -v WARNING | tail -2 | tee -a "$LOG"
}

# The deposit A/B: ch (current default) vs grave (no scatters — per-level
# graveyard + one argsort/gather per band). Same code path otherwise.
run flagship_ch    RAYTPU_BENCH_FRAMES=16
run flagship_grave RAYTPU_BENCH_FRAMES=16 RAYTPU_DEPOSIT=grave

# Mode refresh under both deposit modes for the two sub-target modes.
run two_humans_ch    RAYTPU_BENCH_FRAMES=8 RAYTPU_BENCH_MODE=two_humans
run two_humans_grave RAYTPU_BENCH_FRAMES=8 RAYTPU_BENCH_MODE=two_humans \
    RAYTPU_DEPOSIT=grave
run car1080_ch    RAYTPU_BENCH_FRAMES=8 RAYTPU_BENCH_MODE=car_1080p
run car1080_grave RAYTPU_BENCH_FRAMES=8 RAYTPU_BENCH_MODE=car_1080p \
    RAYTPU_DEPOSIT=grave

# two_humans decomposition: rebuild cost vs LBVH tree quality.
echo "=== exp31 $(date +%H:%M:%S)" | tee -a "$LOG"
python experiments/exp31_lbvh_quality.py 2>&1 | grep -v WARNING \
  | tail -12 | tee -a "$LOG"

# Keypress-to-frame latency with the drop-stale-frames loop (scale 2 & 4).
echo "=== exp26 scale2 $(date +%H:%M:%S)" | tee -a "$LOG"
RAYTPU_LADDER_SCALE=2 python experiments/exp26_keypress_latency.py 2>&1 \
  | grep -v WARNING | tail -8 | tee -a "$LOG"
echo "=== exp26 scale4 $(date +%H:%M:%S)" | tee -a "$LOG"
RAYTPU_LADDER_SCALE=4 python experiments/exp26_keypress_latency.py 2>&1 \
  | grep -v WARNING | tail -8 | tee -a "$LOG"
echo "=== r3b sweep done $(date +%H:%M:%S)" | tee -a "$LOG"
