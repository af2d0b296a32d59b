#!/bin/bash
# Single-file inference (reference scripts/inference/inference_cli.sh)
python tools/inference_cli.py --checkpoint-path "${1:?checkpoint path}" "${@:2}"
