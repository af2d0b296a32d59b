#!/usr/bin/env bash
# Round-3 pending, sixth pass — prioritized for headline impact:
# 1) fused-ff A/B on the headline bench (decides the VFT_FUSED_FF default)
# 2) SDXL train step re-measure (flash-bwd padding-mask elision landed)
# 3) config #3 single-chip fallback: batch 1 (batch 2/4 OOM, see BASELINE.md)
# 4) Lumina2 train profile (config #4 MFU treatment)
# Usage: bash scripts/bench/round3_pending6.sh [logfile]
set -u
cd "$(dirname "$0")/../.."
LOG="${1:-/tmp/r3_pending6.log}"
PY=/opt/venv/bin/python
run() {
  echo "=== $* ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
  timeout "${RUN_TIMEOUT:-2400}" "$@" 2>&1 | tail -25 | tee -a "$LOG"
  echo "--- exit ${PIPESTATUS[0]} ---" | tee -a "$LOG"
}
run env VFT_FUSED_FF=1 BENCH_INIT_RETRIES=2 $PY bench.py
run env VFT_FUSED_FF=0 BENCH_INIT_RETRIES=0 $PY bench.py
run $PY tools/bench/sdxl_train_step.py
run $PY tools/bench/family_train_step.py auraflow --batch 1
run $PY tools/bench/family_train_step.py lumina2 --profile /tmp/prof_lumina2_train
run $PY tools/bench/xplane_stats.py /tmp/prof_lumina2_train --top 30
run $PY tools/bench/xplane_stats.py /tmp/prof_lumina2_train --by-source --top 20
run env VFT_FUSED_FF=1 $PY tools/bench/family_generate.py lumina2
run $PY tools/bench/attn_kernel_bench.py --train
run $PY tools/bench/server_throughput.py --staggered
echo "pending6 done $(date -u)" | tee -a "$LOG"
