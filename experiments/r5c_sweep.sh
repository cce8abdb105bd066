#!/bin/bash
# r5c: final round-5 re-pin of the BASELINE modes at settled defaults
# (VERDICT item 3/8: every mode carries a current-round number), plus the
# 848x480 gallery regen. light_metal / moon / two_humans are pinned by
# r5a in the same worker phase.
cd "$(dirname "$0")/.."
source experiments/sweeplib.sh experiments/r5c_sweep.log

run warmup_discard RAYTPU_BENCH_FRAMES=8

run flagship RAYTPU_BENCH_FRAMES=16
run c12_cube RAYTPU_BENCH_FRAMES=32 RAYTPU_BENCH_MODE=c12_cube
run car_1080p RAYTPU_BENCH_FRAMES=8 RAYTPU_BENCH_MODE=car_1080p

run_cmd gallery -- env GALLERY_FRAMES=32 python experiments/make_gallery.py

finish
