#!/usr/bin/env bash
# Round-3 pending measurements, second pass: the rows the 04:08 queue
# lost when the session died, plus the AuraFlow config #3 re-run after
# defaulting that family to plain full remat (its 108 MB flash-out
# saves OOM'd the 16 GB chip on top of the 3.4 GB NF4 base).
# Usage: bash scripts/bench/round3_pending2.sh [logfile]
set -u
cd "$(dirname "$0")/../.."
LOG="${1:-/tmp/r3_pending2.log}"
run() {
  echo "=== $* ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
  timeout "${RUN_TIMEOUT:-4000}" "$@" 2>&1 | tail -25 | tee -a "$LOG"
  echo "--- exit ${PIPESTATUS[0]} ---" | tee -a "$LOG"
}
run python tools/bench/family_train_step.py auraflow
run python tools/bench/family_generate.py auraflow_nf4
run python tools/bench/lumina2_step_probe.py
# idle-host re-run: the first lumina2 capture raced a CPU-heavy verify
# drive for the single host core, skewing host-side collation
run python tools/bench/server_throughput.py --family lumina2
echo "pending2 done $(date -u)" | tee -a "$LOG"
