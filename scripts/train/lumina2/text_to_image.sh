#!/bin/bash
# Lumina Image 2.0 fine-tune (reference scripts/train/lumina2/text_to_image.sh)
python train/lumina2/text_to_image.py --config configs/lumina2/text_to_image.yml "$@"
