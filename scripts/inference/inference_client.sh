#!/bin/bash
# Gradio client for the inference server (reference scripts/inference/inference_webui_client.sh)
python tools/inference_client.py "$@"
