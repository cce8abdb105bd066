#!/bin/bash
# r5b: (a) exp26 keypress latency rerun after the pipelined-readback loop
#      (r5: readbacks start at dispatch on a reader pool; publisher thread
#      emits in order; VRT never blocks) — target: ladder-off median
#      <= ~110 ms (the tunnel RTT floor + ~0 wait);
# (b) headless --chain warm A/B on the flagship-class scene (exp38,
#      VERDICT item 7).
cd "$(dirname "$0")/.."
source experiments/sweeplib.sh experiments/r5b_sweep.log

run_cmd exp26_latency -- python experiments/exp26_keypress_latency.py
run_cmd exp38_headless_chain -- python experiments/exp38_headless_chain.py

finish
