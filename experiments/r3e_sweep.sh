#!/bin/bash
# Round-3 session-4: thin-leaf CLUSTER_SIZE A/B (exp33 modeled 0.67x walk
# at T=2, 0.79x at T=4) + re-pin of the modes a winner would move.
# Opens with a DISCARDED warm-up run (first bench process of a sweep
# measures ~10% slow — PERF_NOTES r3c confound).
set -u
cd "$(dirname "$0")/.."
LOG=experiments/r3e_sweep.log
run() {
  local tag="$1"; shift
  echo "=== $tag $(date +%H:%M:%S)" | tee -a "$LOG"
  env "$@" python bench.py 2>&1 | grep -v WARNING | tail -2 | tee -a "$LOG"
}

run warmup_discard RAYTPU_BENCH_FRAMES=8

# The A/B: same phase, same process pattern, flagship 720p.
run flagship_T8 RAYTPU_BENCH_FRAMES=16 RAYTPU_CLUSTER=8
run flagship_T4 RAYTPU_BENCH_FRAMES=16 RAYTPU_CLUSTER=4
run flagship_T2 RAYTPU_BENCH_FRAMES=16 RAYTPU_CLUSTER=2
# Re-run the control to bracket worker phase drift.
run flagship_T8_again RAYTPU_BENCH_FRAMES=16 RAYTPU_CLUSTER=8

# The winner's effect on the other traversal-bound modes.
run two_humans_T4 RAYTPU_BENCH_FRAMES=8 RAYTPU_BENCH_MODE=two_humans RAYTPU_CLUSTER=4
run two_humans_T2 RAYTPU_BENCH_FRAMES=8 RAYTPU_BENCH_MODE=two_humans RAYTPU_CLUSTER=2
run car_1080p_T4  RAYTPU_BENCH_FRAMES=8 RAYTPU_BENCH_MODE=car_1080p RAYTPU_CLUSTER=4
run car_1080p_T2  RAYTPU_BENCH_FRAMES=8 RAYTPU_BENCH_MODE=car_1080p RAYTPU_CLUSTER=2

# Fresh frame anatomy at the A/B endpoints.
run trace_T8 RAYTPU_BENCH_FRAMES=8 RAYTPU_CLUSTER=8 RAYTPU_TRACE_DIR=/tmp/rtrace_t8
python experiments/parse_trace.py /tmp/rtrace_t8 24 2>&1 | tail -30 | tee -a "$LOG"
run trace_T2 RAYTPU_BENCH_FRAMES=8 RAYTPU_CLUSTER=2 RAYTPU_TRACE_DIR=/tmp/rtrace_t2
python experiments/parse_trace.py /tmp/rtrace_t2 24 2>&1 | tail -30 | tee -a "$LOG"

echo "=== r3e sweep done $(date +%H:%M:%S)" | tee -a "$LOG"
