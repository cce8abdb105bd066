#!/bin/bash
# Round-4 sweep C (after r4b decides the PLOC defaults):
#   1. exp26 keypress latency with the new engine instrumentation
#      (VERDICT item 5: sustained < 150 ms at 720p, ladder on)
#   2. car_1080p band-count re-sweep at the new tree (VERDICT item 6)
#   3. fresh flagship device trace at the winner config
# Usage: optionally prefix with RAYTPU_BVH=ploc (exported) if r4b wins.
cd "$(dirname "$0")/.."
source experiments/sweeplib.sh experiments/r4c_sweep.log

run_cmd exp26_latency -- python experiments/exp26_keypress_latency.py

# c12 chain A/B (re-run: the r4b cells hit the bench chain-arg bug,
# fixed since — renderer.render_chain wants uniforms, not the Camera).
run c12_ctrl RAYTPU_BENCH_FRAMES=32 RAYTPU_BENCH_MODE=c12_cube
run c12_chain4 RAYTPU_BENCH_FRAMES=32 RAYTPU_BENCH_MODE=c12_cube RAYTPU_BENCH_CHAIN=4
run c12_chain16 RAYTPU_BENCH_FRAMES=32 RAYTPU_BENCH_MODE=c12_cube RAYTPU_BENCH_CHAIN=16
run flagship_chain4 RAYTPU_BENCH_FRAMES=16 RAYTPU_BENCH_CHAIN=4

# Device-rebuild cost breakdown (the r4b lbvh_ploc 0.77 FPS post-mortem:
# _build_jit_ploc returned a FRESH jit wrapper per build -> per-frame
# retrace+recompile; fixed, exp37 measures the true device costs).
run_cmd exp37_build_cost -- python experiments/exp37_device_build_cost.py

# Re-bench lbvh_ploc with the cached wrapper (r4b cell was the bug).
run two_humans_lbvh_ploc2 RAYTPU_BENCH_FRAMES=8 RAYTPU_BENCH_MODE=two_humans RAYTPU_DEVICE_BUILD=lbvh RAYTPU_DEVICE_TREE=ploc

# Deeper chain on c12 (chain16 = 153 FPS, RTT still ~2.3 ms/frame at 2
# dispatches per 32 frames — one more halving on the table).
run c12_chain32 RAYTPU_BENCH_FRAMES=64 RAYTPU_BENCH_MODE=c12_cube RAYTPU_BENCH_CHAIN=32

run warmup_discard RAYTPU_BENCH_FRAMES=8 RAYTPU_BENCH_MODE=car_1080p

# Band sweep: 1080p row-tiles = 135; divisors -> bands of rays.
# 0 = one band (2.07M rays); 414720 = 5 bands (the r3c winner);
# 518400 = 4; 345600 = 6; 230400 = 9.
run car_band5 RAYTPU_BENCH_FRAMES=8 RAYTPU_BENCH_MODE=car_1080p RAYTPU_BENCH_BAND=414720
run car_band4 RAYTPU_BENCH_FRAMES=8 RAYTPU_BENCH_MODE=car_1080p RAYTPU_BENCH_BAND=518400
run car_band6 RAYTPU_BENCH_FRAMES=8 RAYTPU_BENCH_MODE=car_1080p RAYTPU_BENCH_BAND=345600
run car_band3 RAYTPU_BENCH_FRAMES=8 RAYTPU_BENCH_MODE=car_1080p RAYTPU_BENCH_BAND=691200
run car_chain4 RAYTPU_BENCH_FRAMES=8 RAYTPU_BENCH_MODE=car_1080p RAYTPU_BENCH_CHAIN=4

# Fresh anatomy at the winner config.
run trace_flagship RAYTPU_BENCH_FRAMES=8 RAYTPU_TRACE_DIR=/tmp/rtrace_r4
run_cmd parse_trace -- python experiments/parse_trace.py /tmp/rtrace_r4 24

# Price the MXU one-hot compaction primitives (the unpriced divergence
# idea; build the kernel iff the printed ratio < ~0.6).
run_cmd exp36_mxu -- python experiments/exp36_mxu_compact.py

finish
