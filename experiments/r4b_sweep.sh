#!/bin/bash
# Round-4 sweep B: PLOC tree quality A/B (exp35: x0.89-0.92 visit events
# vs host SAH at the SAME kernel shape — the surviving lever after r4a
# killed W16 and r3f killed thin leaves).
#   * static host builds: RAYTPU_BVH=ploc vs sah (flagship/car; also the
#     instanced BLAS for two_humans rides build_bvh, so ploc applies)
#   * live-edit device rebuild: RAYTPU_DEVICE_BUILD=lbvh with
#     RAYTPU_DEVICE_TREE=ploc vs karras (VERDICT item 4: >= 7 FPS target)
cd "$(dirname "$0")/.."
source experiments/sweeplib.sh experiments/r4b_sweep.log

run_cmd smoke_ploc -- python experiments/r4b_smoke.py
if [ $? -ne 0 ]; then
  echo "=== PLOC smoke FAILED; aborting sweep" | tee -a "$LOG"
  exit 1
fi

run warmup_discard RAYTPU_BENCH_FRAMES=8

run flagship_sah RAYTPU_BENCH_FRAMES=16
run flagship_ploc RAYTPU_BENCH_FRAMES=16 RAYTPU_BVH=ploc
run flagship_sah_again RAYTPU_BENCH_FRAMES=16

run two_humans_inst_sah RAYTPU_BENCH_FRAMES=8 RAYTPU_BENCH_MODE=two_humans
run two_humans_inst_ploc RAYTPU_BENCH_FRAMES=8 RAYTPU_BENCH_MODE=two_humans RAYTPU_BVH=ploc

run two_humans_lbvh_karras RAYTPU_BENCH_FRAMES=8 RAYTPU_BENCH_MODE=two_humans RAYTPU_DEVICE_BUILD=lbvh
run two_humans_lbvh_ploc RAYTPU_BENCH_FRAMES=8 RAYTPU_BENCH_MODE=two_humans RAYTPU_DEVICE_BUILD=lbvh RAYTPU_DEVICE_TREE=ploc

run car_1080p_ploc RAYTPU_BENCH_FRAMES=8 RAYTPU_BENCH_MODE=car_1080p RAYTPU_BVH=ploc

# c12_cube (VERDICT item 7, 0.85x the reference's primary rate): chain k
# frames per dispatch (lax.scan) to amortize per-dispatch overhead — the
# binding constraint on a 14-tri 640x480 fixed-light frame.
run c12_ctrl RAYTPU_BENCH_FRAMES=32 RAYTPU_BENCH_MODE=c12_cube
run c12_chain4 RAYTPU_BENCH_FRAMES=32 RAYTPU_BENCH_MODE=c12_cube RAYTPU_BENCH_CHAIN=4
run c12_chain16 RAYTPU_BENCH_FRAMES=32 RAYTPU_BENCH_MODE=c12_cube RAYTPU_BENCH_CHAIN=16

# flagship chain (deep frames amortize less, but dispatch glue is real)
run flagship_chain4 RAYTPU_BENCH_FRAMES=16 RAYTPU_BVH=ploc RAYTPU_BENCH_CHAIN=4

finish
