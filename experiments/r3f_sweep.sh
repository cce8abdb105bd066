#!/bin/bash
# Round-3 session-4, queue 2: thin-leaf CLUSTER_SIZE A/B after the
# subcluster-row fix (128-float table rows at every T — Mosaic VMEM
# tiling rejects narrower row slices; see core/fast_types.py).
# Small-first: a 256x128 smoke at T=2 gates the full benches.
set -u
cd "$(dirname "$0")/.."
LOG=experiments/r3f_sweep.log
run() {
  local tag="$1"; shift
  echo "=== $tag $(date +%H:%M:%S)" | tee -a "$LOG"
  env "$@" python bench.py 2>&1 | grep -v WARNING | tail -2 | tee -a "$LOG"
}

echo "=== smoke_T2 $(date +%H:%M:%S)" | tee -a "$LOG"
RAYTPU_CLUSTER=2 python experiments/r3_smoke.py 2>&1 | grep -v WARNING \
  | tail -6 | tee -a "$LOG"
if [ "${PIPESTATUS[0]}" -ne 0 ]; then
  echo "=== smoke FAILED; aborting sweep" | tee -a "$LOG"
  exit 1
fi

run warmup_discard RAYTPU_BENCH_FRAMES=8 RAYTPU_CLUSTER=4

# The A/B: same phase, same process pattern, flagship 720p.
run flagship_T4 RAYTPU_BENCH_FRAMES=16 RAYTPU_CLUSTER=4
run flagship_T2 RAYTPU_BENCH_FRAMES=16 RAYTPU_CLUSTER=2
# Control brackets the phase drift (r3e same-phase T8: 8.49 / 8.64).
run flagship_T8 RAYTPU_BENCH_FRAMES=16 RAYTPU_CLUSTER=8

# Winner candidates on the other traversal-bound modes.
run two_humans_T4 RAYTPU_BENCH_FRAMES=8 RAYTPU_BENCH_MODE=two_humans RAYTPU_CLUSTER=4
run two_humans_T2 RAYTPU_BENCH_FRAMES=8 RAYTPU_BENCH_MODE=two_humans RAYTPU_CLUSTER=2
run car_1080p_T4  RAYTPU_BENCH_FRAMES=8 RAYTPU_BENCH_MODE=car_1080p RAYTPU_CLUSTER=4
run car_1080p_T2  RAYTPU_BENCH_FRAMES=8 RAYTPU_BENCH_MODE=car_1080p RAYTPU_CLUSTER=2

echo "=== r3f sweep done $(date +%H:%M:%S)" | tee -a "$LOG"
