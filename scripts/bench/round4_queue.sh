#!/usr/bin/env bash
# Round-4 measurement queue (VERDICT.md r3 "Next round"), runs AFTER
# round3_pending6.sh: Lumina2 anomaly probe + fresh denominators (#2),
# NF4 fused-matmul A/B (#4), packed-attention A/B rows (#7), DeepCache/
# W8A8 for the remaining families (#8), fused-FF train-step A/B (#3's
# lever), auraflow staggered serving.
# Usage: bash scripts/bench/round4_queue.sh [logfile]
set -u
cd "$(dirname "$0")/../.."
LOG="${1:-/tmp/r4_queue2.log}"
PY=/opt/venv/bin/python
run() {
  echo "=== $* ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
  timeout "${RUN_TIMEOUT:-2400}" "$@" 2>&1 | tail -25 | tee -a "$LOG"
  echo "--- exit ${PIPESTATUS[0]} ---" | tee -a "$LOG"
}
# -- verdict #2: Lumina2 anomaly root-cause + fresh denominators
run $PY tools/bench/lumina2_step_probe.py 20
run $PY tools/bench/family_generate.py lumina2
run $PY tools/bench/family_generate.py lumina2 --deep-cache 2
run $PY tools/bench/family_generate.py lumina2 --deep-cache 3
run $PY tools/bench/family_generate.py lumina2_w8a8
run $PY tools/bench/server_throughput.py --family lumina2
run $PY tools/bench/server_throughput.py --family lumina2 --staggered
# batch-scaling isolation for the 0.79x window-batching regression
run $PY tools/bench/lumina2_batch_ab.py
run $PY tools/bench/lumina2_batch_ab.py --no-mask
run env VFT_PACKED_ATTN=0 $PY tools/bench/lumina2_batch_ab.py
# -- verdict #4: NF4 fused matmul A/B (train + generate)
run $PY tools/bench/sdxl_train_step.py --nf4
run env VFT_NF4_FUSED=0 $PY tools/bench/sdxl_train_step.py --nf4
# -- verdict #3 lever: fused-FF effect on the SDXL train step
run env VFT_FUSED_FF=1 $PY tools/bench/sdxl_train_step.py
# -- verdict #3: where do the 765 ms go? (train-step per-op profile)
run $PY tools/bench/sdxl_train_step.py --profile /tmp/prof_sdxl_train
run $PY tools/bench/xplane_stats.py /tmp/prof_sdxl_train --top 30
run $PY tools/bench/xplane_stats.py /tmp/prof_sdxl_train --by-source --top 20
# -- verdict #7: packed-attention A/B rows per family
run $PY tools/bench/family_generate.py auraflow_nf4
run env VFT_PACKED_ATTN=0 $PY tools/bench/family_generate.py auraflow_nf4
run $PY tools/bench/family_generate.py cogview4
run env VFT_PACKED_ATTN=0 $PY tools/bench/family_generate.py cogview4
# -- verdict #8: DeepCache + W8A8 for the remaining served families
run $PY tools/bench/family_generate.py cogview4 --deep-cache 2
run $PY tools/bench/family_generate.py cogview4_w8a8
# re-run after the collect() signature fix
run $PY tools/bench/attn_kernel_bench.py --train
# -- r4 levers landed mid-round: LoRA concat dot + flash pad elimination
run $PY tools/bench/partial_block_probe.py
run $PY tools/bench/sdxl_train_step.py
run env VFT_LORA_CONCAT=0 $PY tools/bench/sdxl_train_step.py
run $PY tools/bench/family_train_step.py lumina2
run env VFT_LORA_CONCAT=0 $PY tools/bench/family_train_step.py lumina2
run $PY bench.py
echo "round4 queue done $(date -u)" | tee -a "$LOG"
