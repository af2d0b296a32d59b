#!/bin/bash
# AuraFlow shortcut-model distillation (reference scripts/train/auraflow/shortcut.sh)
python train/auraflow/shortcut.py --config configs/auraflow/shortcut.yml "$@"
