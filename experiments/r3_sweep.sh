#!/bin/bash
# Round-3 TPU validation + glue A/B sweep. Run from the repo root with a
# generous budget and let it FINISH (killing a client mid-RPC wedges the
# TPU worker — CLAUDE.md). Results append to experiments/r3_sweep.log.
set -u
cd "$(dirname "$0")/.."
LOG=experiments/r3_sweep.log
run() {
  local tag="$1"; shift
  echo "=== $tag $(date +%H:%M:%S)" | tee -a "$LOG"
  env "$@" python bench.py 2>&1 | grep -v WARNING | tail -2 | tee -a "$LOG"
}

# Small-first kernel smoke (new key-mode kernel binary) — a fatal bug
# at full frame can wedge the worker; catch it at 256x128 first.
echo "=== smoke $(date +%H:%M:%S)" | tee -a "$LOG"
if ! python experiments/r3_smoke.py > /tmp/r3_smoke.out 2>&1; then
  grep -v WARNING /tmp/r3_smoke.out | tail -12 | tee -a "$LOG"
  echo "SMOKE FAILED — aborting sweep (full-frame benches on a bad kernel\
 can wedge the worker)" | tee -a "$LOG"
  exit 1
fi
grep -v WARNING /tmp/r3_smoke.out | tail -10 | tee -a "$LOG"

# Fresh flagship baseline with in-kernel count rows + carried keys.
run flagship_default RAYTPU_BENCH_FRAMES=12
# Packed-state rounds: column gather (regressed r3) vs row gather
# (transpose + row-take + transpose) now that keys are kernel-emitted.
run flagship_packed_col RAYTPU_BENCH_FRAMES=12 RAYTPU_WAVE=fused_packed
run flagship_packed_row RAYTPU_BENCH_FRAMES=12 RAYTPU_WAVE=fused_packed \
    RAYTPU_PACK_GATHER=row
# Flat glue with one explicit transpose after the row-gather (contiguous
# per-field unpacks instead of 12 strided column slices).
run flagship_packT RAYTPU_BENCH_FRAMES=12 RAYTPU_GLUE=packT
# Deep-round knobs (unmeasured A/Bs from bc6fddf): wider deep tiles and
# unordered pushes for narrow incoherent rounds.
run flagship_deep32 RAYTPU_BENCH_FRAMES=12 RAYTPU_DEEP_SUB=32
run flagship_ordmin RAYTPU_BENCH_FRAMES=12 RAYTPU_ORDER_MINW=49152
# Multi-bounce tail rounds (in-kernel per-ray budget keeps them exact).
run flagship_tailb2 RAYTPU_BENCH_FRAMES=12 RAYTPU_TAIL_BCAP=2
run flagship_tailb3 RAYTPU_BENCH_FRAMES=12 RAYTPU_TAIL_BCAP=3
# Sort-key quality (exp28: bounce-1 tile unions x0.68-0.75 visits vs
# pd5; both kernel-emitted, so zero glue cost).
run flagship_om9 RAYTPU_BENCH_FRAMES=12 RAYTPU_SORT_KEY=om9
run flagship_cid RAYTPU_BENCH_FRAMES=12 RAYTPU_SORT_KEY=cid
# No-color carry (death deposits ride atten): 25% less sort traffic,
# 6 fewer kernel HBM blocks/round; bit-identical images (tested).
run flagship_f12 RAYTPU_BENCH_FRAMES=12 RAYTPU_WAVE=fused12
run flagship_f12_cid RAYTPU_BENCH_FRAMES=12 RAYTPU_WAVE=fused12 \
    RAYTPU_SORT_KEY=cid
# Mode validation at round-3 final state.
run two_humans RAYTPU_BENCH_FRAMES=8 RAYTPU_BENCH_MODE=two_humans
run car_1080p RAYTPU_BENCH_FRAMES=8 RAYTPU_BENCH_MODE=car_1080p
echo "sweep done $(date +%H:%M:%S)" | tee -a "$LOG"

# exp27: MXU leaf intersection microbench (det-identity MT) — decides
# whether round 4 builds the fat-leaf matmul traversal.
echo "=== exp27 $(date +%H:%M:%S)" | tee -a "$LOG"
python experiments/exp27_mxu_mt.py 2>&1 | grep -v WARNING | tail -20 | tee -a "$LOG"

# exp26: keypress-to-frame latency at 720p through the real ViewerApp
# (ladder on/off measured inside the script).
echo "=== exp26 $(date +%H:%M:%S)" | tee -a "$LOG"
python experiments/exp26_keypress_latency.py 2>&1 | grep -v WARNING | tail -12 | tee -a "$LOG"
