#!/bin/bash
# SDXL LoRA fine-tune (reference scripts/train/sdxl/text_to_image.sh; no accelerate launch — SPMD sharding comes from trainer.mesh)
python train/sdxl/text_to_image.py --config configs/sdxl/text_to_image_lora.yml "$@"
