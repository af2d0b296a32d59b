#!/usr/bin/env bash
# Round-4 follow-ups after round4_queue.sh: the corrected batch-scaling
# probe, the fixed-engine sdxl staggered run, fused-FF and block-size
# A/Bs against the phase-B kernels, and the LoRA-concat Lumina2 A/B.
# Usage: bash scripts/bench/round4b_queue.sh [logfile]
set -u
cd "$(dirname "$0")/../.."
LOG="${1:-/tmp/r4b_queue.log}"
PY=/opt/venv/bin/python
run() {
  echo "=== $* ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
  timeout "${RUN_TIMEOUT:-2400}" "$@" 2>&1 | tail -25 | tee -a "$LOG"
  echo "--- exit ${PIPESTATUS[0]} ---" | tee -a "$LOG"
}
# corrected per-step batch-scaling probe (blocks every call)
run $PY tools/bench/lumina2_batch_ab.py
run $PY tools/bench/lumina2_batch_ab.py --no-mask
# staggered continuous batching in its design regime (sdxl; engine fixed)
run $PY tools/bench/server_throughput.py --staggered
# fused-FF A/B on the NEW kernels (earlier 8.54 s FF=1 was pre-phase-B)
run env VFT_FUSED_FF=1 $PY tools/bench/family_generate.py lumina2
# k-block-size A/B at S=4352: largest divisor (256) vs forced legacy 1024
run $PY tools/bench/family_generate.py lumina2
run env VFT_FLASH_BLOCK_K=1024 $PY tools/bench/family_generate.py lumina2
run env VFT_FLASH_BLOCK_K=512 $PY tools/bench/family_generate.py lumina2
# NF4 default decision: fused kernel vs XLA dequant on the remaining
# NF4 surfaces (train b4 showed XLA 968.5 vs fused 1048.0)
run env VFT_NF4_FUSED=0 $PY tools/bench/family_train_step.py auraflow --batch 1
run env VFT_NF4_FUSED=0 $PY tools/bench/family_generate.py auraflow_nf4
# flash bwd with a 32 MB scoped-VMEM stack: bigger k-blocks, fewer
# full passes over Q/dO (the _bwd_block_cap lever, never yet measured)
run env XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=32768 VFT_SCOPED_VMEM_KIB=32768 \
    VFT_LORA_CONCAT=0 $PY tools/bench/sdxl_train_step.py
# SDXL train without the concat (the r4 regression check: 765 -> 827)
run env VFT_LORA_CONCAT=0 $PY tools/bench/sdxl_train_step.py
# cogview4 compiler-crash bisection: partial-q kill switch, then classic attn
run env VFT_FLASH_PARTIAL_Q=0 $PY tools/bench/family_generate.py cogview4
run env VFT_FLASH_PARTIAL_Q=0 VFT_PACKED_ATTN=0 $PY tools/bench/family_generate.py cogview4
run $PY tools/bench/family_generate.py cogview4_w8a8
echo "round4b done $(date -u)" | tee -a "$LOG"
