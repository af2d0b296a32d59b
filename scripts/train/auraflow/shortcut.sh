#!/bin/bash
python train/auraflow/shortcut.py --config configs/auraflow/shortcut.yml
