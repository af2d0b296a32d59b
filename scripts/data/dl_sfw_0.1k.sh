#!/bin/bash
# 100-image safe-rated fixture set (reference scripts/data/dl_sfw_0.1k.sh)
python ./tools/data/dl_safebooru.py --output "./data/sfw_0.1k" --limit 100
