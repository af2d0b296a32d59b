#!/bin/bash
# Tag a folder with wd-tagger-rs (reference scripts/data/wd_tagger.sh).
# `tagger` is the external wd-tagger-rs binary; its json output is what
# vision_ft_tpu/dataset/text_to_image.py's metadata reader consumes.
MODEL=eva02-large
BATCH_SIZE=32
FORMAT=json

tagger v3 \
    --model $MODEL \
    --batch-size $BATCH_SIZE \
    --format $FORMAT \
    "$@"
