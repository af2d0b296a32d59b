#!/usr/bin/env bash
# Round-4d: the last decision rows.
# Usage: bash scripts/bench/round4d_queue.sh [logfile]
set -u
cd "$(dirname "$0")/../.."
LOG="${1:-/tmp/r4d_queue.log}"
PY=/opt/venv/bin/python
run() {
  echo "=== $* ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
  timeout "${RUN_TIMEOUT:-2400}" "$@" 2>&1 | tail -25 | tee -a "$LOG"
  echo "--- exit ${PIPESTATUS[0]} ---" | tee -a "$LOG"
}
# NF4 default decision, completing the matrix (generate said XLA 16.54 s
# vs fused 21.77 s): does the XLA-dequant TRAIN step fit/win at 6.8B b1?
run env VFT_NF4_FUSED=0 $PY tools/bench/family_train_step.py auraflow --batch 1
# re-run the corrupted row (per-iter blocking now): SDXL NF4 XLA-dequant
run env VFT_NF4_FUSED=0 $PY tools/bench/sdxl_train_step.py --nf4
# short-K cross-attention kernel A/B on the SDXL train step
run env VFT_FLASH_SHORTK=1 $PY tools/bench/sdxl_train_step.py
# scoped-VMEM retry via LIBTPU_INIT_ARGS (XLA_FLAGS name rejected)
run env LIBTPU_INIT_ARGS=--xla_tpu_scoped_vmem_limit_kib=32768 VFT_SCOPED_VMEM_KIB=32768 \
    $PY tools/bench/sdxl_train_step.py
# lumina2 train with the new width-auto fused FF (inner 9216 -> kernel on)
run $PY tools/bench/family_train_step.py lumina2
# headline on final defaults
run $PY bench.py
echo "round4d done $(date -u)" | tee -a "$LOG"
