#!/bin/bash
# SDXL per-quant-config generation benchmark (reference scripts/bench/sdxl_quant.sh)
python tools/bench/sdxl_quant.py "$@"
