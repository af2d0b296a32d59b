#!/usr/bin/env bash
# Round-3 measurement backlog: everything the round-2 tunnel outage left
# unmeasured (VERDICT.md Weak #1-#4) plus the round-3 additions. Run
# serially on the real chip; never run the CPU test suite concurrently
# (it starves the host-side XLA compile).
# Usage: bash scripts/bench/round3_backlog.sh [logfile]
set -u
cd "$(dirname "$0")/../.."
LOG="${1:-/tmp/round3_backlog.log}"
run() {
  echo "=== $* ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
  timeout "${RUN_TIMEOUT:-2400}" "$@" 2>&1 | tail -20 | tee -a "$LOG"
  echo "--- exit ${PIPESTATUS[0]} ---" | tee -a "$LOG"
}
# headline first, with room for the init-retry loop + first compile
RUN_TIMEOUT=4200 run env BENCH_INIT_RETRIES=5 BENCH_DEADLINE_S=4000 python bench.py
# tracked train configs: #2 SDXL, #4 Lumina2 (+save-qkv A/B), #3 AuraFlow, #5 NF4
run python tools/bench/sdxl_train_step.py
run python tools/bench/family_train_step.py lumina2
run python tools/bench/family_train_step.py lumina2 --save-qkv
run python tools/bench/family_train_step.py auraflow
run python tools/bench/sdxl_train_step.py --nf4
# config #5 second half: batched server throughput (sdxl + new lumina2)
run python tools/bench/server_throughput.py
run python tools/bench/server_throughput.py --family lumina2
# generate paths: DeepCache A/B for both families that support it
run python tools/bench/family_generate.py sdxl
run python tools/bench/family_generate.py sdxl --deep-cache 2
run python tools/bench/family_generate.py sdxl --deep-cache 3
run python tools/bench/family_generate.py lumina2
run python tools/bench/family_generate.py lumina2 --deep-cache 2
run python tools/bench/family_generate.py lumina2 --deep-cache 3
run python tools/bench/family_generate.py auraflow_nf4
# W8A8 compute-in-int8 A/B (int8_w8a8 vs the bf16 rows above)
run python tools/bench/family_generate.py sdxl_w8a8
run python tools/bench/family_generate.py lumina2_w8a8
# heads-packed BSHD attention A/B vs the round-2 numbers (AuraFlow d=256,
# CogView4 d=128 went transpose-free this round)
run python tools/bench/family_generate.py auraflow
run python tools/bench/family_generate.py cogview4
run python tools/bench/family_generate.py auraflow_w8a8
run python tools/bench/family_generate.py auraflow --deep-cache 2
run python tools/bench/family_generate.py cogview4 --deep-cache 2
# first-ever flux generate number: NF4 denoiser + staged offload (12B on 16 GB)
run python tools/bench/family_generate.py flux_nf4
echo "backlog done $(date -u)" | tee -a "$LOG"
