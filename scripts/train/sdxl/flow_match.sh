#!/bin/bash
# SDXL flow-match conversion (reference scripts/train/sdxl/flow_match.sh)
python train/sdxl/flow_match.py --config configs/sdxl/flow_match.yml "$@"
