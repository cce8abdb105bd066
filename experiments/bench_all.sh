#!/bin/bash
# Re-bench every mode at the current defaults (run AFTER sweep winners
# are folded into the code defaults). Appends to experiments/bench_all.log.
set -u
cd "$(dirname "$0")/.."
LOG=experiments/bench_all.log
run() {
  local tag="$1"; shift
  echo "=== $tag $(date +%H:%M:%S)" | tee -a "$LOG"
  env "$@" python bench.py 2>&1 | grep -v WARNING | tail -2 | tee -a "$LOG"
}
run flagship RAYTPU_BENCH_FRAMES=16
run c12_cube RAYTPU_BENCH_MODE=c12_cube RAYTPU_BENCH_FRAMES=16
run light_metal RAYTPU_BENCH_MODE=light_metal RAYTPU_BENCH_FRAMES=16
run moon RAYTPU_BENCH_MODE=moon RAYTPU_BENCH_FRAMES=16
run two_humans RAYTPU_BENCH_MODE=two_humans RAYTPU_BENCH_FRAMES=8
run car_1080p RAYTPU_BENCH_MODE=car_1080p RAYTPU_BENCH_FRAMES=8
echo "bench_all done $(date +%H:%M:%S)" | tee -a "$LOG"
