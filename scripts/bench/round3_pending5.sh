#!/usr/bin/env bash
# Round-3 pending measurements, fifth pass (fresh session — /tmp logs from
# pending4 were lost with the host). Prioritized for a ~1h window:
# config #3 (AuraFlow train step, the last unmeasured tracked config)
# first, then the NF4-resident generates and the Lumina2 train profile.
# Usage: bash scripts/bench/round3_pending5.sh [logfile]
set -u
cd "$(dirname "$0")/../.."
LOG="${1:-/tmp/r3_pending5.log}"
PY=/opt/venv/bin/python
run() {
  echo "=== $* ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
  timeout "${RUN_TIMEOUT:-2400}" "$@" 2>&1 | tail -25 | tee -a "$LOG"
  echo "--- exit ${PIPESTATUS[0]} ---" | tee -a "$LOG"
}
# config #3: group=2 doubles the backward working set (group=4 OOM'd)
run $PY tools/bench/family_train_step.py auraflow --remat-group 2
run $PY tools/bench/family_train_step.py auraflow --batch 2
# NF4-text-encoder resident posture (no 609 s offload staging)
run $PY tools/bench/family_generate.py auraflow_nf4
run $PY tools/bench/family_generate.py flux_nf4
# config #4 MFU treatment: per-op train profile
run $PY tools/bench/family_train_step.py lumina2 --profile /tmp/prof_lumina2_train
run $PY tools/bench/xplane_stats.py /tmp/prof_lumina2_train --top 30
run $PY tools/bench/xplane_stats.py /tmp/prof_lumina2_train --by-source --top 20
# rows never reached
run $PY tools/bench/family_generate.py cogview4
run $PY tools/bench/family_generate.py cogview4 --deep-cache 2
run $PY tools/bench/server_throughput.py --staggered
run $PY tools/bench/attn_kernel_bench.py --train
run $PY tools/bench/family_generate.py auraflow_w8a8
echo "pending5 done $(date -u)" | tee -a "$LOG"
