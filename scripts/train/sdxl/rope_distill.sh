#!/bin/bash
# SDXL RoPE retrofit distillation (reference scripts/train/sdxl/rope_distill.sh)
python train/sdxl/rope_distill.py --config configs/sdxl/rope_distill.yml "$@"
