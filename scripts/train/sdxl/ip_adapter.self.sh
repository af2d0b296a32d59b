#!/bin/bash
# IP-Adapter self-reference training (reference scripts/train/sdxl/ip_adapter.self.sh)
python train/sdxl/ip_adapter.self.py --config configs/sdxl/ip_adapter.yml "$@"
