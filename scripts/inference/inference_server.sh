#!/bin/bash
# HTTP inference server (reference scripts/inference/inference_webui_server.sh)
python tools/inference_server.py "$@"
