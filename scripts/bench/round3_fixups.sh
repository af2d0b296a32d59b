#!/usr/bin/env bash
# Round-3 fixup measurements: the three rows the first pass lost to
# harness bugs (sdxl server-throughput tokenizer protocol, NF4 remat
# posture) and the AuraFlow scoped-VMEM kernel OOM fixed in
# "Split BSHD flash backward past the fused-dq scoped-VMEM limit".
# Usage: bash scripts/bench/round3_fixups.sh [logfile]
set -u
cd "$(dirname "$0")/../.."
LOG="${1:-/tmp/round3_fixups.log}"
run() {
  echo "=== $* ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
  timeout "${RUN_TIMEOUT:-3600}" "$@" 2>&1 | tail -20 | tee -a "$LOG"
  echo "--- exit ${PIPESTATUS[0]} ---" | tee -a "$LOG"
}
run python tools/bench/family_train_step.py auraflow
run python tools/bench/sdxl_train_step.py --nf4
run python tools/bench/server_throughput.py
# re-run on an idle host: the first capture raced a CPU-heavy verify
# drive for the single host core, which skews the host-side collation
run python tools/bench/server_throughput.py --family lumina2
echo "fixups done $(date -u)" | tee -a "$LOG"
