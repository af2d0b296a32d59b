#!/bin/bash
# Style tokenizer training (reference scripts/train/sdxl/style_tokenizer.sh)
python train/sdxl/style_tokenizer.py --config configs/sdxl/style_tokenizer.yml "$@"
