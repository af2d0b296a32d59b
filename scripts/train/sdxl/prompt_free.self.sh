#!/bin/bash
# PFG self-reference training (reference scripts/train/sdxl/prompt_free.self.sh)
python train/sdxl/prompt_free.self.py --config configs/sdxl/prompt_free.self.yml "$@"
