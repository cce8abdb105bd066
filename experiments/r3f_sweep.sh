#!/bin/bash
# Round-4 opener (VERDICT r3 item 1): thin-leaf CLUSTER_SIZE A/B after the
# subcluster-row fix (128-float table rows at every T — Mosaic VMEM
# tiling rejects narrower row slices; see core/fast_types.py).
# Small-first: a 256x128 smoke at T=2 gates the full benches.
cd "$(dirname "$0")/.."
source experiments/sweeplib.sh experiments/r3f_sweep.log

run_cmd smoke_T2 -- env RAYTPU_CLUSTER=2 python experiments/r3_smoke.py
if [ $? -ne 0 ]; then
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

finish
