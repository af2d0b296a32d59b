#!/bin/bash
# AuraFlow LoRA fine-tune (reference scripts/train/auraflow/text_to_image.sh)
python train/auraflow/text_to_image.py --config configs/auraflow/text_to_image_lora.yml "$@"
