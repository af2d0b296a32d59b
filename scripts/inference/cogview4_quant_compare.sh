#!/bin/bash
# CogView4 quantization comparison (reference scripts/inference/cogview4_quant_compare.sh)
python tools/cogview4_quant_compare.py "$@"
