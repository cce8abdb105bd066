#!/bin/bash
# Round-3 session-3, queue 2 (run AFTER r3b_sweep.sh): band-count A/B.
#
# Fewer, larger bands = fewer per-band bounce-round ladders: each band
# pays its own shrink ladder (argsort + gather + kernel fixed cost per
# round), so at 720p going 5 bands (184,320 rays) -> 3 (307,200) cuts
# ~2/5 of the per-round fixed costs IF the wider rounds don't lose
# tile coherence or hit dispatch-size trouble. 307,200 is already a
# proven dispatch width (the merged tail runs there every frame).
# 460,800 (2 bands) probes further; 921,600 (1 band) is NOT attempted —
# that exact single-dispatch size crashed the worker in round 1
# (CLAUDE.md). Band counts must divide the row-tile count (90 at 720p,
# 135 at 1080p), hence these specific values.
set -u
cd "$(dirname "$0")/.."
LOG=experiments/r3c_sweep.log
run() {
  local tag="$1"; shift
  echo "=== $tag $(date +%H:%M:%S)" | tee -a "$LOG"
  env "$@" python bench.py 2>&1 | grep -v WARNING | tail -2 | tee -a "$LOG"
}

# 720p flagship: same-phase default (5 bands) first — the worker's
# phase drifts between sweeps, so cross-sweep FPS comparisons lie.
run flagship_b5 RAYTPU_BENCH_FRAMES=16
run flagship_b3 RAYTPU_BENCH_FRAMES=16 RAYTPU_BENCH_BAND=307200
run flagship_b2 RAYTPU_BENCH_FRAMES=16 RAYTPU_BENCH_BAND=460800

# 1080p: default 196608 -> 15 bands of 138,240; 230400 -> 9 bands;
# 414720 -> 5 bands.
run car1080_b9 RAYTPU_BENCH_FRAMES=8 RAYTPU_BENCH_MODE=car_1080p \
    RAYTPU_BENCH_BAND=230400
run car1080_b5 RAYTPU_BENCH_FRAMES=8 RAYTPU_BENCH_MODE=car_1080p \
    RAYTPU_BENCH_BAND=414720

# two_humans rides whatever flagship band wins; probe the 3-band size.
run two_humans_b3 RAYTPU_BENCH_FRAMES=8 RAYTPU_BENCH_MODE=two_humans \
    RAYTPU_BENCH_BAND=307200
echo "=== r3c sweep done $(date +%H:%M:%S)" | tee -a "$LOG"
