#!/usr/bin/env bash
# Round-2 measurement backlog (docs/PERFORMANCE.md "pending TPU
# re-measure"): run serially on the real chip, log everything.
# Usage: bash scripts/bench/round2_backlog.sh [logfile]
set -u
cd "$(dirname "$0")/../.."
LOG="${1:-/tmp/round2_backlog.log}"
run() {
  echo "=== $* ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
  timeout "${RUN_TIMEOUT:-2400}" "$@" 2>&1 | tail -20 | tee -a "$LOG"
  echo "--- exit ${PIPESTATUS[0]} ---" | tee -a "$LOG"
}
# headline first, with room for the init-retry loop + first compile
RUN_TIMEOUT=4200 run env BENCH_INIT_RETRIES=5 python bench.py
run python tools/bench/sdxl_train_step.py
run python tools/bench/family_train_step.py lumina2
run python tools/bench/family_train_step.py lumina2 --save-qkv
run python tools/bench/family_train_step.py auraflow
run python tools/bench/sdxl_train_step.py --nf4
run python tools/bench/server_throughput.py
run python tools/bench/family_generate.py sdxl
run python tools/bench/family_generate.py sdxl --deep-cache 2
run python tools/bench/family_generate.py auraflow_nf4
echo "backlog done $(date -u)" | tee -a "$LOG"
