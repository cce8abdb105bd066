#!/bin/bash
# Shared sweep harness (VERDICT r3 item 3: the old `| tail -2` pattern
# swallowed tracebacks — six r3e cells were lost silently).
#
# Usage:   source experiments/sweeplib.sh <logfile>
# Then:    run <tag> [ENV=VAL ...]            # runs python bench.py
#          run_cmd <tag> -- <cmd> [args ...]  # runs an arbitrary command
#
# Each cell's FULL output goes to $CELLDIR/<tag>.log; the sweep log gets
# the result line(s) on success, or the last 40 lines (incl. traceback)
# plus a loud FAILED marker on failure. A failed cell sets SWEEP_FAILED
# and the final `finish` call exits nonzero.
set -u
LOG="${1:?usage: source sweeplib.sh <logfile>}"
CELLDIR="${LOG%.log}_cells"
mkdir -p "$CELLDIR"
SWEEP_FAILED=0

run() {
  local tag="$1"; shift
  local cell="$CELLDIR/$tag.log"
  echo "=== $tag $(date +%H:%M:%S)" | tee -a "$LOG"
  env "$@" python bench.py >"$cell" 2>&1
  local rc=$?
  if [ $rc -eq 0 ]; then
    grep -v -e WARNING -e '^[0-9:]* W ' "$cell" | tail -2 | tee -a "$LOG"
  else
    echo "!!! CELL FAILED rc=$rc (full log: $cell)" | tee -a "$LOG"
    tail -40 "$cell" | tee -a "$LOG"
    SWEEP_FAILED=1
  fi
  return $rc
}

run_cmd() {
  local tag="$1"; shift
  [ "$1" = "--" ] && shift
  local cell="$CELLDIR/$tag.log"
  echo "=== $tag $(date +%H:%M:%S)" | tee -a "$LOG"
  "$@" >"$cell" 2>&1
  local rc=$?
  if [ $rc -eq 0 ]; then
    grep -v -e WARNING -e '^[0-9:]* W ' "$cell" | tail -6 | tee -a "$LOG"
  else
    echo "!!! CELL FAILED rc=$rc (full log: $cell)" | tee -a "$LOG"
    tail -40 "$cell" | tee -a "$LOG"
    SWEEP_FAILED=1
  fi
  return $rc
}

finish() {
  if [ "$SWEEP_FAILED" -ne 0 ]; then
    echo "=== SWEEP HAD FAILED CELLS $(date +%H:%M:%S)" | tee -a "$LOG"
    exit 1
  fi
  echo "=== sweep done $(date +%H:%M:%S)" | tee -a "$LOG"
}
