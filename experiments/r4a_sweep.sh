#!/bin/bash
# Round-4 sweep A: (1) same-phase T8 controls for the two modes where the
# r3f thin-leaf sweep lacked them (car_1080p looked +22% at T4 with no
# in-phase control; two_humans had none either), and (2) the BVH16 A/B —
# RAYTPU_WIDE=16 (x0.74 visits, x1.49 vector slab ops) motivated by the
# r3f result that per-visit fixed cost dominates (fast_types.py note).
cd "$(dirname "$0")/.."
source experiments/sweeplib.sh experiments/r4a_sweep.log

run_cmd smoke_W16 -- env RAYTPU_WIDE=16 python experiments/r3_smoke.py
if [ $? -ne 0 ]; then
  echo "=== W16 smoke FAILED; running controls only" | tee -a "$LOG"
  W16_OK=0
else
  W16_OK=1
fi

run warmup_discard RAYTPU_BENCH_FRAMES=8

# Same-phase controls at the production defaults (T8, W8).
run flagship_ctrl RAYTPU_BENCH_FRAMES=16
run two_humans_ctrl RAYTPU_BENCH_FRAMES=8 RAYTPU_BENCH_MODE=two_humans
run car_1080p_ctrl RAYTPU_BENCH_FRAMES=8 RAYTPU_BENCH_MODE=car_1080p

# car looked better at T4 in r3f — re-measure the pair back to back.
run car_1080p_T4 RAYTPU_BENCH_FRAMES=8 RAYTPU_BENCH_MODE=car_1080p RAYTPU_CLUSTER=4

if [ "$W16_OK" -eq 1 ]; then
  run flagship_W16 RAYTPU_BENCH_FRAMES=16 RAYTPU_WIDE=16
  run two_humans_W16 RAYTPU_BENCH_FRAMES=8 RAYTPU_BENCH_MODE=two_humans RAYTPU_WIDE=16
  run car_1080p_W16 RAYTPU_BENCH_FRAMES=8 RAYTPU_BENCH_MODE=car_1080p RAYTPU_WIDE=16
  # Does W16 compound with the car T4 hint?
  run car_1080p_W16_T4 RAYTPU_BENCH_FRAMES=8 RAYTPU_BENCH_MODE=car_1080p RAYTPU_WIDE=16 RAYTPU_CLUSTER=4
  run flagship_W16_again RAYTPU_BENCH_FRAMES=16 RAYTPU_WIDE=16
  run flagship_ctrl_again RAYTPU_BENCH_FRAMES=16
fi

finish
