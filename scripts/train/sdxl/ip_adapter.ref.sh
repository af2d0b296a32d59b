#!/bin/bash
# IP-Adapter reference-image training (reference scripts/train/sdxl/ip_adapter.ref.sh)
python train/sdxl/ip_adapter.ref.py --config configs/sdxl/ip_adapter.yml "$@"
