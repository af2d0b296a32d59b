#!/usr/bin/env bash
# Round-3 pending measurements, fourth pass. Prior state:
#   - pending3 got the SDXL train profile (744 ms/step device; flash
#     fwd+bwd at seq 4096 run ~41 TF/s vs the 77 TF/s microbench) and
#     found auraflow --remat-group 4 OOMs (4x the backward working set);
#     it was killed mid `--batch 2`.
#   - auraflow_nf4 generate now quantizes the UMT5 tower too (resident,
#     no offload staging).
# Usage: bash scripts/bench/round3_pending4.sh [logfile]
set -u
cd "$(dirname "$0")/../.."
LOG="${1:-/tmp/r3_pending4.log}"
run() {
  echo "=== $* ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
  timeout "${RUN_TIMEOUT:-4000}" "$@" 2>&1 | tail -25 | tee -a "$LOG"
  echo "--- exit ${PIPESTATUS[0]} ---" | tee -a "$LOG"
}
# config #3 first: group=2 doubles the backward working set (not 4x)
run python tools/bench/family_train_step.py auraflow --remat-group 2
run python tools/bench/family_train_step.py auraflow --batch 2
# NF4-text-encoder resident posture (no 609 s offload staging)
run python tools/bench/family_generate.py auraflow_nf4
run python tools/bench/family_generate.py flux_nf4
# config #4 MFU treatment: per-op train profile
run python tools/bench/family_train_step.py lumina2 --profile /tmp/prof_lumina2_train
run python tools/bench/xplane_stats.py /tmp/prof_lumina2_train --top 30
run python tools/bench/xplane_stats.py /tmp/prof_lumina2_train --by-source --top 20
# family-generate rows never reached
run python tools/bench/family_generate.py cogview4
run python tools/bench/family_generate.py cogview4 --deep-cache 2
run python tools/bench/family_generate.py auraflow_w8a8
# continuous batching's target regime
run python tools/bench/server_throughput.py --staggered
# kernel A/B on the train-step shapes (batch 4 + grads)
run python tools/bench/attn_kernel_bench.py --train
echo "pending4 done $(date -u)" | tee -a "$LOG"
