#!/bin/bash
# Peak device memory snapshot (reference scripts/inference/snapshot_max_memory.sh)
python tools/snapshot_max_memory.py "$@"
