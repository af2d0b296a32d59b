#!/bin/bash
# AuraFlow learned-PE to RoPE migration (reference scripts/train/auraflow/rope_migration.sh)
python train/auraflow/rope_migration.py --config configs/auraflow/text_to_image_lora.yml "$@"
