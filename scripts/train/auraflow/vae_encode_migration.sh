#!/bin/bash
# AuraFlow VAE-encoder migration (reference scripts/train/auraflow/vae_encode_migration.sh)
python train/auraflow/vae_encode_migration.py --config configs/auraflow/text_to_image_lora.yml "$@"
