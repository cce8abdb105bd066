#!/bin/bash
# Resume of r4c_sweep.sh: the first session ended mid-exp37 (cells through
# flagship_chain4 completed and are in r4c_sweep.log; sweeplib appends, so
# we log to the same file). Remaining cells only.
cd "$(dirname "$0")/.."
source experiments/sweeplib.sh experiments/r4c_sweep.log

run_cmd exp37_build_cost -- python experiments/exp37_device_build_cost.py

# Re-bench lbvh_ploc with the cached wrapper (r4b cell was the bug).
run two_humans_lbvh_ploc2 RAYTPU_BENCH_FRAMES=8 RAYTPU_BENCH_MODE=two_humans RAYTPU_DEVICE_BUILD=lbvh RAYTPU_DEVICE_TREE=ploc

# Deeper chain on c12 (chain16 = 153 FPS, RTT still ~2.3 ms/frame at 2
# dispatches per 32 frames — one more halving on the table).
run c12_chain32 RAYTPU_BENCH_FRAMES=64 RAYTPU_BENCH_MODE=c12_cube RAYTPU_BENCH_CHAIN=32

run warmup_discard RAYTPU_BENCH_FRAMES=8 RAYTPU_BENCH_MODE=car_1080p

# Band sweep: 1080p row-tiles = 135; divisors -> bands of rays.
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
