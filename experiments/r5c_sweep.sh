#!/bin/bash
# r5c: final round-5 re-pin of the BASELINE modes at settled defaults
# (VERDICT item 3/8: every mode carries a current-round number), plus
# in-phase reruns of exp26 (keypress latency after the pipelined-readback
# loop) and exp38 (headless chain A/B, fixed to time render_s not the
# host build), plus the 848x480 gallery regen. The r5b run of exp26/exp38
# hit a degraded worker phase minutes after a wedge recovery (renders
# 150-350 ms vs the 115 ms in-phase norm) — these reruns are the numbers
# of record. light_metal / moon / two_humans are pinned by r5a.
cd "$(dirname "$0")/.."
source experiments/sweeplib.sh experiments/r5c_sweep.log

run warmup_discard RAYTPU_BENCH_FRAMES=8

run flagship RAYTPU_BENCH_FRAMES=16
run c12_cube RAYTPU_BENCH_FRAMES=32 RAYTPU_BENCH_MODE=c12_cube
run car_1080p RAYTPU_BENCH_FRAMES=8 RAYTPU_BENCH_MODE=car_1080p

run_cmd exp38_headless_chain -- python experiments/exp38_headless_chain.py
run_cmd exp26_latency -- python experiments/exp26_keypress_latency.py

run_cmd gallery -- env GALLERY_FRAMES=32 python experiments/make_gallery.py

finish
