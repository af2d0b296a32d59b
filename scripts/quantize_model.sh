#!/bin/bash
# Offline checkpoint quantizer (reference scripts/quantize_model.sh)
python tools/quantize_model.py "$@"
