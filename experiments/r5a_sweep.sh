#!/bin/bash
# r5a: (a) tail-round structure knobs on flagship — TAIL_BCAP>1 fuses
#      multiple bounces per sorted tail round (fewer sorts + glue at the
#      narrow deep widths where re-sorting buys least), DEEP_SUB widens
#      deep-round tiles (halves the per-ray share of per-visit cost when
#      the union walk is size-independent anyway) — the two cheap attacks
#      on the ~30 ms/frame of non-kernel glue left by the r4c trace;
# (b) the refit live-edit A/B (VERDICT r5 item 4): captured-topology
#      device refit vs instanced TLAS/BLAS vs Karras LBVH on two_humans;
# (c) light_metal + moon re-pins (VERDICT item 3: no unbenched modes).
cd "$(dirname "$0")/.."
source experiments/sweeplib.sh experiments/r5a_sweep.log

run warmup_discard RAYTPU_BENCH_FRAMES=8

run flagship_ctrl RAYTPU_BENCH_FRAMES=16
run flagship_tailbcap2 RAYTPU_BENCH_FRAMES=16 RAYTPU_TAIL_BCAP=2
run flagship_tailbcap3 RAYTPU_BENCH_FRAMES=16 RAYTPU_TAIL_BCAP=3
run flagship_deepsub32 RAYTPU_BENCH_FRAMES=16 RAYTPU_DEEP_SUB=32
run flagship_bcap2_deepsub32 RAYTPU_BENCH_FRAMES=16 RAYTPU_TAIL_BCAP=2 \
    RAYTPU_DEEP_SUB=32

run two_humans_inst RAYTPU_BENCH_FRAMES=8 RAYTPU_BENCH_MODE=two_humans
run two_humans_refit RAYTPU_BENCH_FRAMES=8 RAYTPU_BENCH_MODE=two_humans \
    RAYTPU_DEVICE_BUILD=refit
run two_humans_lbvh RAYTPU_BENCH_FRAMES=8 RAYTPU_BENCH_MODE=two_humans \
    RAYTPU_DEVICE_BUILD=lbvh

run light_metal RAYTPU_BENCH_FRAMES=16 RAYTPU_BENCH_MODE=light_metal
run moon RAYTPU_BENCH_FRAMES=16 RAYTPU_BENCH_MODE=moon

finish
