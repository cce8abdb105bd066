#!/bin/bash
# Round-3 session-3, queue 3: instanced-BVH A/B + full mode re-pin.
# Opens with a DISCARDED warm-up run (the first bench process of a sweep
# measures ~10% slow — PERF_NOTES r3c confound).
set -u
cd "$(dirname "$0")/.."
LOG=experiments/r3d_sweep.log
run() {
  local tag="$1"; shift
  echo "=== $tag $(date +%H:%M:%S)" | tee -a "$LOG"
  env "$@" python bench.py 2>&1 | grep -v WARNING | tail -2 | tee -a "$LOG"
}

run warmup_discard RAYTPU_BENCH_FRAMES=8

# Headline + the live-edit A/B (two_humans now drags an instance per
# frame; instanced TLAS/BLAS vs on-device LBVH).
run flagship        RAYTPU_BENCH_FRAMES=16
run two_humans_inst RAYTPU_BENCH_FRAMES=8 RAYTPU_BENCH_MODE=two_humans
run two_humans_lbvh RAYTPU_BENCH_FRAMES=8 RAYTPU_BENCH_MODE=two_humans \
    RAYTPU_DEVICE_BUILD=lbvh
run car_1080p       RAYTPU_BENCH_FRAMES=8 RAYTPU_BENCH_MODE=car_1080p

# Remaining BASELINE modes at current defaults.
run c12_cube    RAYTPU_BENCH_FRAMES=16 RAYTPU_BENCH_MODE=c12_cube
run light_metal RAYTPU_BENCH_FRAMES=16 RAYTPU_BENCH_MODE=light_metal
run moon        RAYTPU_BENCH_FRAMES=16 RAYTPU_BENCH_MODE=moon

# Keypress-latency anatomy (raw preview/full frame costs + loop timeline).
echo "=== exp26b $(date +%H:%M:%S)" | tee -a "$LOG"
python experiments/exp26b_latency_anatomy.py 2>&1 | grep -v WARNING \
  | tail -16 | tee -a "$LOG"
echo "=== r3d sweep done $(date +%H:%M:%S)" | tee -a "$LOG"
