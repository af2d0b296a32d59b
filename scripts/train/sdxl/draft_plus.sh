#!/bin/bash
# DRaFT+ reward training
python train/sdxl/draft_plus.py --config configs/sdxl/draft_plus.yml "$@"
