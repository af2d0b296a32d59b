#!/bin/bash
# PFG reference-image training (reference scripts/train/sdxl/prompt_free.ref.sh)
python train/sdxl/prompt_free.ref.py --config configs/sdxl/prompt_free.ref.yml "$@"
