#!/usr/bin/env bash
# Round-3 pending measurements, third pass: per-op train-step profiles
# (the ≤650 ms SDXL push needs a measured cost map, not the r2
# forward-only one) and the family-generate rows the backlog never
# reached (cogview4, flux_nf4, auraflow W8A8/packed A/B).
# Usage: bash scripts/bench/round3_pending3.sh [logfile]
set -u
cd "$(dirname "$0")/../.."
LOG="${1:-/tmp/r3_pending3.log}"
run() {
  echo "=== $* ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
  timeout "${RUN_TIMEOUT:-4000}" "$@" 2>&1 | tail -25 | tee -a "$LOG"
  echo "--- exit ${PIPESTATUS[0]} ---" | tee -a "$LOG"
}
run python tools/bench/sdxl_train_step.py --profile /tmp/prof_sdxl_train
run python tools/bench/xplane_stats.py /tmp/prof_sdxl_train --top 40
# config #3: grouped remat shrinks the 36x102MB boundary saves that OOM'd
# both the kernel-saves AND full-remat postures; fall back to batch 2
run python tools/bench/family_train_step.py auraflow --remat-group 4
run python tools/bench/family_train_step.py auraflow --batch 2
# auraflow_nf4 resident re-run (NF4 text encoder, no offload staging —
# the 609 s first capture was axon-tunnel param migration, not compute)
run python tools/bench/family_generate.py auraflow_nf4
run python tools/bench/family_train_step.py lumina2 --profile /tmp/prof_lumina2_train
run python tools/bench/xplane_stats.py /tmp/prof_lumina2_train --top 40
run python tools/bench/family_generate.py cogview4
run python tools/bench/family_generate.py cogview4 --deep-cache 2
run python tools/bench/family_generate.py flux_nf4
run python tools/bench/family_generate.py auraflow_w8a8
# continuous batching's target regime: staggered arrivals, mixed step
# counts — serial vs window vs step-level continuous
run python tools/bench/server_throughput.py --staggered
echo "pending3 done $(date -u)" | tee -a "$LOG"
