#!/bin/bash
# CogView4 fine-tune
python train/cogview4/text_to_image.py --config configs/cogview4/text_to_image.yml "$@"
