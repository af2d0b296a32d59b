#!/bin/bash
# Konachan downloader (reference scripts/data/dl_konachan.sh; needs egress + cheesechaser)
python ./tools/data/dl_konachan.py "$@"
