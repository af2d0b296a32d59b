#!/bin/bash
# IP-Adapter Kyara character training (reference scripts/train/sdxl/ip_adapter.kyara.sh)
python train/sdxl/ip_adapter.kyara.py --config configs/sdxl/ip_adapter.yml "$@"
