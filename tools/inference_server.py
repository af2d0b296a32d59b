"""Inference HTTP server (reference tools/inference_server.py).

The reference serves AuraFlow over LitServe; neither litserve nor fastapi
is in this image, so the same surface is served with the stdlib http
server: POST /predict with a JSON GenerationParams body returns image/webp
bytes. Loads a TrainConfig YAML (model section) + optional LoRA
safetensors, exactly like the reference (:42-59); generation runs through
the jitted pipeline (the jax analogue of its torch.compile).

  python tools/inference_server.py -C configs/auraflow.yml \
      --tokenizer-path /path/to/tokenizer --port 8123
"""

import os as _os
import sys as _sys

_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO not in _sys.path:
    _sys.path.insert(0, _REPO)


import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from io import BytesIO
from typing import Optional

import click
import yaml
from pydantic import BaseModel, field_validator

DEFAULT_NEGATIVE = (
    "bad quality, worst quality, lowres, bad anatomy, sketch, jpeg artifacts, "
    "ugly, poorly drawn, signature, watermark, bad anatomy, bad hands, bad feet, "
    "retro, old, 2000s, 2010s, 2011s, 2012s, 2013s, multiple views, screencap"
)


class GenerationParams(BaseModel):
    prompt: str
    negative_prompt: str = DEFAULT_NEGATIVE
    inference_steps: int = 25
    cfg_scale: float = 6.5
    width: int = 768
    height: int = 1024

    @field_validator("width", "height")
    @classmethod
    def check_divisible_by_64(cls, value):
        if value % 64 != 0:
            raise ValueError(f"{value} is not divisible by 64")
        return value


class T2IModel:
    def __init__(self, config_path: str, peft_path: Optional[str], tokenizer_path: Optional[str]):
        from vision_ft_tpu.config import TrainConfig
        from vision_ft_tpu.models.auraflow import AuraFlowConig, AuraFlowModel
        from vision_ft_tpu.models.auraflow.util import convert_from_original_key

        with open(config_path) as f:
            config = TrainConfig(**yaml.safe_load(f))
        tokenizer = None
        if tokenizer_path is not None:
            from transformers import AutoTokenizer

            tokenizer = AutoTokenizer.from_pretrained(tokenizer_path)
        model_config = AuraFlowConig.model_validate(config.model)
        self.model = AuraFlowModel.from_original_checkpoint(model_config, tokenizer=tokenizer)

        if peft_path is not None:
            print(f"Loading PEFT weights from {peft_path}")
            from vision_ft_tpu.modules.peft import load_peft_weight
            from vision_ft_tpu.utils import safetensors as st

            peft_dict = st.load_file(peft_path)
            peft_dict = {convert_from_original_key(k): v for k, v in peft_dict.items()}
            self.model.params = load_peft_weight(self.model.params, peft_dict)
        self._lock = threading.Lock()

    def generate(self, params: GenerationParams):
        with self._lock:  # one generation at a time per chip
            return self.model.generate(
                prompt=params.prompt,
                negative_prompt=params.negative_prompt,
                num_inference_steps=params.inference_steps,
                cfg_scale=params.cfg_scale,
                width=params.width,
                height=params.height,
            )[0]


def make_handler(model: T2IModel):
    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            if self.path not in ("/predict", "/"):
                self.send_error(404)
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(length) or b"{}")
                params = GenerationParams(**body)
            except Exception as e:  # validation errors -> 422 like litserve
                self.send_error(422, str(e))
                return
            try:
                image = model.generate(params)
            except Exception as e:
                self.send_error(500, str(e))
                return
            buffered = BytesIO()
            image.save(buffered, format="WEBP")
            data = buffered.getvalue()
            self.send_response(200)
            self.send_header("Content-Type", "image/webp")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            if self.path == "/health":
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(b'{"status": "ok"}')
            else:
                self.send_error(404)

        def log_message(self, fmt, *args):
            print(f"[server] {fmt % args}")

    return Handler


@click.command()
@click.option("--config_path", "-C", type=str, required=True)
@click.option("--peft_path", type=str, default=None)
@click.option("--tokenizer-path", type=str, default=None)
@click.option("--port", type=int, default=8123)
def main(config_path: str, peft_path: Optional[str], tokenizer_path: Optional[str], port: int):
    print("Loading model...")
    model = T2IModel(config_path, peft_path, tokenizer_path)
    print(f"Serving on :{port} (POST /predict)")
    ThreadingHTTPServer(("0.0.0.0", port), make_handler(model)).serve_forever()


if __name__ == "__main__":
    main()
