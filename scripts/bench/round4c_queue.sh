#!/usr/bin/env bash
# Round-4c: re-measure everything after the default reverts (legacy
# flash geometry, separate-delta LoRA) — the r4 A/Bs showed the new
# defaults losing — plus the deciding A/Bs that were entangled with
# those defaults, the cogview4 crash bisection, and the fixed staggered
# and batch-scaling probes.
# Usage: bash scripts/bench/round4c_queue.sh [logfile]
set -u
cd "$(dirname "$0")/../.."
LOG="${1:-/tmp/r4c_queue.log}"
PY=/opt/venv/bin/python
run() {
  echo "=== $* ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
  timeout "${RUN_TIMEOUT:-2400}" "$@" 2>&1 | tail -25 | tee -a "$LOG"
  echo "--- exit ${PIPESTATUS[0]} ---" | tee -a "$LOG"
}
# headline + tracked train configs on the reverted defaults
run env BENCH_INIT_RETRIES=2 $PY bench.py
run $PY tools/bench/sdxl_train_step.py
run $PY tools/bench/family_train_step.py lumina2
run $PY tools/bench/family_train_step.py auraflow --batch 1
# NF4 A/B, now untangled from the concat default
run $PY tools/bench/sdxl_train_step.py --nf4
run env VFT_NF4_FUSED=0 $PY tools/bench/sdxl_train_step.py --nf4
run $PY tools/bench/family_generate.py auraflow_nf4
run env VFT_NF4_FUSED=0 $PY tools/bench/family_generate.py auraflow_nf4
# lumina2 generate: legacy geometry + the fused-FF default decision
run $PY tools/bench/family_generate.py lumina2
run env VFT_FUSED_FF=1 $PY tools/bench/family_generate.py lumina2
# flash bwd with a 32 MB scoped-VMEM stack (never measured)
run env XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=32768 VFT_SCOPED_VMEM_KIB=32768 \
    $PY tools/bench/sdxl_train_step.py
# cogview4 crash bisection (legacy defaults; then classic attn)
run $PY tools/bench/family_generate.py cogview4
run env VFT_PACKED_ATTN=0 $PY tools/bench/family_generate.py cogview4
run $PY tools/bench/family_generate.py cogview4_w8a8
# staggered continuous batching in its design regime (sdxl, fixed engine)
run $PY tools/bench/server_throughput.py --staggered
# corrected batch-scaling probe (blocks every call)
run $PY tools/bench/lumina2_batch_ab.py
run $PY tools/bench/lumina2_batch_ab.py --no-mask
echo "round4c done $(date -u)" | tee -a "$LOG"
