#!/bin/bash
# SDXL LoRA fine-tune on TPU
python train/sdxl/text_to_image.py --config configs/sdxl/text_to_image_lora.yml
