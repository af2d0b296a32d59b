"""Batched inference HTTP server (reference tools/inference_server.py).

The reference serves AuraFlow over LitServe; neither litserve nor fastapi
is in this image, so the same surface is served with the stdlib http
server: POST /predict with a JSON GenerationParams body returns image/webp
bytes. Loads a TrainConfig YAML (model section) + optional LoRA
safetensors, exactly like the reference (:42-59). Families: auraflow,
sdxl (cfg_rescale, deep-cache), lumina2 (renorm_cfg, cfg_trunc_ratio),
cogview4, flux (distilled_guidance).

Unlike the reference's one-request-at-a-time LitServe setup, concurrent
requests are MICRO-BATCHED: a collator thread groups compatible requests
(same width/height/steps/cfg — the static-shape key a jitted generate
needs) arriving within a short window into one batched generate() call,
so N concurrent users cost ~one denoise pass instead of N. This is the
"batched inference server" of tracked config #5 (BASELINE.json).

``--scheduler continuous`` (sdxl, lumina2, auraflow) swaps in step-level continuous
batching (vision_ft_tpu.serving): requests join a fixed pool of latent
slots at denoise-step boundaries, so staggered traffic with mixed step
counts / seeds / guidance scales shares the device with no collation
window and no lockstep requirement.

The wan video family is served too (beyond the reference's server):
requests carry ``frames``/``fps`` and the response is video/mp4.

  python tools/inference_server.py -C configs/auraflow.yml \
      --tokenizer-path /path/to/tokenizer --port 8123 --max-batch 4
"""

import os as _os
import sys as _sys

_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO not in _sys.path:
    _sys.path.insert(0, _REPO)


import json
import threading
import time
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
    cfg_rescale: float = 0.0  # SDXL only (std-matching CFG rescale)
    renorm_cfg: float = 1.0  # Lumina2 only (norm-matching renorm CFG)
    cfg_trunc_ratio: float = 0.0  # Lumina2 only (skip CFG early in the schedule)
    distilled_guidance: float = 1.0  # Flux only (guidance-embedder scale)
    frames: Optional[int] = None  # Wan only (video length; default 16)
    fps: int = 24  # Wan only (mp4 encode rate; no effect on images)
    width: int = 768
    height: int = 1024
    seed: Optional[int] = None  # deterministic generation (all families)

    @field_validator("width", "height")
    @classmethod
    def check_divisible_by_64(cls, value):
        if value % 64 != 0:
            raise ValueError(f"{value} is not divisible by 64")
        return value

    @field_validator("cfg_rescale", "cfg_trunc_ratio")
    @classmethod
    def check_unit_range(cls, value):
        if not 0.0 <= value <= 1.0:
            raise ValueError("cfg_rescale / cfg_trunc_ratio must be in [0, 1]")
        return value

    @field_validator("renorm_cfg")
    @classmethod
    def check_renorm_nonnegative(cls, value):
        if value < 0.0:
            raise ValueError("renorm_cfg must be >= 0 (0 disables)")
        return value

    @field_validator("distilled_guidance")
    @classmethod
    def check_distilled_nonnegative(cls, value):
        if value < 0.0:
            raise ValueError("distilled_guidance must be >= 0")
        return value

    @field_validator("frames", "fps")
    @classmethod
    def check_positive(cls, value):
        if value is not None and value < 1:
            raise ValueError("frames / fps must be >= 1")
        return value


class T2IModel:
    def __init__(self, config_path: str, peft_path: Optional[str],
                 tokenizer_path: Optional[str], family: str = "auraflow",
                 deep_cache_interval: Optional[int] = None):
        from vision_ft_tpu.config import TrainConfig

        # every served family supports DeepCache delta caching
        if deep_cache_interval is not None and deep_cache_interval < 1:
            raise ValueError("deep_cache_interval must be >= 1")
        with open(config_path) as f:
            config = TrainConfig(**yaml.safe_load(f))
        tokenizer = None
        if tokenizer_path is not None:
            if family == "sdxl":
                # SDXL's TextEncoder speaks the native CLIP BPE protocol
                # (padded id arrays), not HF BatchEncoding
                from vision_ft_tpu.models.text_encoders.tokenizer import (
                    CLIPTokenizer,
                )

                tokenizer = CLIPTokenizer.from_pretrained_dir(tokenizer_path)
            else:
                from transformers import AutoTokenizer

                tokenizer = AutoTokenizer.from_pretrained(tokenizer_path)
        if family == "sdxl":
            from vision_ft_tpu.models.sdxl.config import SDXLConfig
            from vision_ft_tpu.models.sdxl.pipeline import SDXLModel
            from vision_ft_tpu.models.sdxl.util import convert_from_original_key

            model_config = SDXLConfig.model_validate(config.model)
            self.model = SDXLModel.from_checkpoint(model_config, tokenizer=tokenizer)
        elif family == "auraflow":
            from vision_ft_tpu.models.auraflow import AuraFlowConig, AuraFlowModel
            from vision_ft_tpu.models.auraflow.util import convert_from_original_key

            model_config = AuraFlowConig.model_validate(config.model)
            self.model = AuraFlowModel.from_original_checkpoint(
                model_config, tokenizer=tokenizer
            )
        elif family == "lumina2":
            from vision_ft_tpu.models.lumina2 import Lumina2, Lumina2Config
            from vision_ft_tpu.models.lumina2.util import convert_from_original_key

            model_config = Lumina2Config.model_validate(config.model)
            self.model = Lumina2.from_checkpoint(model_config, tokenizer=tokenizer)
        elif family == "cogview4":
            from vision_ft_tpu.models.cogview4 import (
                CogView4Model,
                convert_from_original_key,
            )
            from vision_ft_tpu.models.cogview4.config import CogView4Config

            model_config = CogView4Config.model_validate(config.model)
            self.model = CogView4Model.from_checkpoint(model_config, tokenizer=tokenizer)
        elif family == "flux":
            from vision_ft_tpu.models.flux.config import FluxConfig
            from vision_ft_tpu.models.flux.pipeline import FluxModel
            from vision_ft_tpu.models.flux.util import convert_from_original_key

            # tokenizer is the T5 one; a CLIP tokenizer loads from the same
            # dir's clip/ subfolder when present (mirrors inference_cli)
            clip_tok = None
            base = getattr(tokenizer, "name_or_path", None)
            if base and _os.path.isdir(_os.path.join(str(base), "clip")):
                from vision_ft_tpu.models.text_encoders.tokenizer import (
                    CLIPTokenizer,
                )

                clip_tok = CLIPTokenizer.from_pretrained_dir(
                    _os.path.join(str(base), "clip")
                )
            model_config = FluxConfig.model_validate(config.model)
            self.model = FluxModel.from_checkpoint(
                model_config, t5_tokenizer=tokenizer, clip_tokenizer=clip_tok
            )
        elif family == "wan":
            import functools

            from vision_ft_tpu.models.wan import Wan22, WanConfig
            from vision_ft_tpu.models.wan import util as wan_util

            convert_from_original_key = functools.partial(
                wan_util.convert_from_original_key, module="denoiser"
            )
            model_config = WanConfig.model_validate(config.model)
            self.model = Wan22.from_checkpoint(model_config, tokenizer=tokenizer)
        else:
            raise ValueError(f"unsupported server family: {family!r}")
        self._family = family
        self._extra = (
            {"deep_cache_interval": deep_cache_interval}
            if deep_cache_interval else {}
        )

        if peft_path is not None:
            print(f"Loading PEFT weights from {peft_path}")
            from vision_ft_tpu.modules.peft import load_peft_weight
            from vision_ft_tpu.utils import safetensors as st

            peft_dict = st.load_file(peft_path)
            peft_dict = {convert_from_original_key(k): v for k, v in peft_dict.items()}
            self.model.params = load_peft_weight(self.model.params, peft_dict)
        self._lock = threading.Lock()

    def generate_batch(self, batch: "list[GenerationParams]"):
        """One jitted generate over a COMPATIBLE group (same shape/steps/
        cfg); returns one image per request, in order."""
        with self._lock:  # one device program at a time per chip
            head = batch[0]
            extra = dict(self._extra)
            if head.cfg_rescale:
                if self._family != "sdxl":
                    raise ValueError("cfg_rescale is SDXL-only")
                extra["cfg_rescale"] = head.cfg_rescale
            if self._family == "lumina2":
                # renorm CFG + CFG truncation (reference lumina2
                # pipeline.py:287-307 / :379-415) ride through natively
                extra["renorm_cfg_scale"] = head.renorm_cfg
                extra["cfg_truncation_ratio"] = head.cfg_trunc_ratio
            else:
                if head.renorm_cfg != 1.0:
                    raise ValueError("renorm_cfg is Lumina2-only")
                if head.cfg_trunc_ratio != 0.0:
                    raise ValueError("cfg_trunc_ratio is Lumina2-only")
            if self._family == "flux":
                extra["distilled_guidance_scale"] = head.distilled_guidance
            elif head.distilled_guidance != 1.0:
                raise ValueError("distilled_guidance is Flux-only")
            if self._family == "wan":
                extra["frames"] = head.frames if head.frames is not None else 16
            elif head.frames is not None:
                raise ValueError("frames is Wan-only (video)")
            if head.seed is not None:
                # seed rides batch_key, so the whole group shares it
                extra["seed"] = head.seed
            return self.model.generate(
                prompt=[p.prompt for p in batch],
                negative_prompt=[p.negative_prompt for p in batch],
                num_inference_steps=head.inference_steps,
                cfg_scale=head.cfg_scale,
                width=head.width,
                height=head.height,
                **extra,
            )


def batch_key(params: GenerationParams) -> tuple:
    """Requests are batchable iff everything that shapes the compiled
    program matches; prompts/negatives ride the batch dimension."""
    return (
        params.width, params.height, params.inference_steps,
        params.cfg_scale, params.cfg_rescale,
        params.renorm_cfg, params.cfg_trunc_ratio,
        params.distilled_guidance, params.frames, params.seed,
    )


class _Pending:
    __slots__ = ("params", "event", "image", "error")

    def __init__(self, params: GenerationParams):
        self.params = params
        self.event = threading.Event()
        self.image = None
        self.error: Optional[Exception] = None


class MicroBatcher:
    """Collate concurrent requests into batched generate() calls.

    A single worker drains the queue: it takes the oldest request, waits
    up to ``window_ms`` for more requests with the same batch_key, then
    runs them as ONE generate. Incompatible requests stay queued for the
    next round. submit() blocks the calling (HTTP handler) thread until
    its image is ready.
    """

    def __init__(self, model, max_batch: int = 4, window_ms: float = 25.0,
                 pad_to_bucket: bool = True):
        self.model = model
        self.max_batch = max_batch
        self.window_s = window_ms / 1000.0
        # every distinct batch size compiles its own XLA program for each
        # pipeline stage; padding groups to power-of-2 buckets bounds the
        # compile set to log2(max_batch)+1 shapes (<=2x padded compute in
        # the worst case, amortized to ~none once traffic fills buckets)
        self.pad_to_bucket = pad_to_bucket
        self._queue: list[_Pending] = []
        self._cv = threading.Condition()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def submit(self, params: GenerationParams):
        item = _Pending(params)
        with self._cv:
            self._queue.append(item)
            self._cv.notify()
        item.event.wait()
        if item.error is not None:
            raise item.error
        return item.image

    def _take_group(self) -> "list[_Pending]":
        with self._cv:
            while not self._queue:
                self._cv.wait()
            head = self._queue[0]
            if head.params.seed is not None:
                # seeded requests run solo: batch row i draws noise from
                # seed+i, so sharing a batch would silently change the
                # image a seed promises (continuous batching has per-slot
                # seed vectors and no such restriction)
                self._queue.remove(head)
                return [head]
            key = batch_key(head.params)
            deadline = time.monotonic() + self.window_s
            while True:
                group = [p for p in self._queue if batch_key(p.params) == key]
                if len(group) >= self.max_batch:
                    group = group[: self.max_batch]
                    break
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                self._cv.wait(timeout=remaining)
            for p in group:
                self._queue.remove(p)
            return group

    def _run(self):
        while True:
            group = self._take_group()
            try:
                batch = [p.params for p in group]
                if self.pad_to_bucket:
                    bucket = 1
                    while bucket < len(batch):
                        bucket *= 2
                    batch = batch + [batch[-1]] * (bucket - len(batch))
                images = self.model.generate_batch(batch)
                for p, image in zip(group, images):
                    p.image = image
            except Exception as e:
                for p in group:
                    p.error = e
            finally:
                for p in group:
                    p.event.set()


class ContinuousScheduler:
    """Step-level continuous batching behind the server's submit() contract.

    Wraps vision_ft_tpu.serving.ContinuousBatcher: requests join a fixed
    pool of latent slots at denoise-step boundaries, so staggered traffic
    with mixed step counts / seeds / guidance shares the device without
    waiting for a collation window. Families: sdxl (ancestral, per-slot
    noise seeds, cfg_rescale), lumina2 (flow matching, renorm CFG +
    per-slot CFG truncation), auraflow (flow matching, plain CFG),
    cogview4 (flow matching + size conditioning) and flux (rectified
    flow, per-slot distilled guidance). The pool's latent shape is fixed at
    construction (one compiled program); requests for another size are
    rejected upfront — run a second server (or the window scheduler) for
    multi-resolution traffic.
    """

    def __init__(self, model: "T2IModel", height: int, width: int,
                 num_slots: int = 4, max_steps: int = 50):
        from vision_ft_tpu.serving import (
            AuraFlowSlotAdapter,
            CogView4SlotAdapter,
            ContinuousBatcher,
            FluxSlotAdapter,
            Lumina2SlotAdapter,
            SDXLSlotAdapter,
            SlotRequest,
        )

        adapters = {
            "sdxl": SDXLSlotAdapter,
            "lumina2": Lumina2SlotAdapter,
            "auraflow": AuraFlowSlotAdapter,
            "cogview4": CogView4SlotAdapter,
            "flux": FluxSlotAdapter,
        }
        if model._family not in adapters:
            raise ValueError(
                "--scheduler continuous currently serves "
                f"{sorted(adapters)} (got {model._family!r})"
            )
        self._SlotRequest = SlotRequest
        self._family = model._family
        self.height, self.width = height, width
        self._engine = ContinuousBatcher(
            adapters[model._family](model.model, height=height, width=width),
            num_slots=num_slots,
            max_steps=max_steps,
        )

    def submit(self, params: GenerationParams):
        if (params.width, params.height) != (self.width, self.height):
            raise ValueError(
                f"continuous pool is fixed at {self.width}x{self.height}; "
                f"got {params.width}x{params.height}"
            )
        family_only = (
            ("cfg_rescale", 0.0, "SDXL", "sdxl"),
            ("renorm_cfg", 1.0, "Lumina2", "lumina2"),
            ("cfg_trunc_ratio", 0.0, "Lumina2", "lumina2"),
            ("distilled_guidance", 1.0, "Flux", "flux"),
        )
        for name, neutral, owner, allowed in family_only:
            if getattr(params, name) != neutral and self._family != allowed:
                raise ValueError(f"{name} is {owner}-only")
        if params.frames is not None:
            raise ValueError("frames is Wan-only (video)")
        return self._engine.submit(
            self._SlotRequest(
                prompt=params.prompt,
                negative_prompt=params.negative_prompt,
                num_inference_steps=params.inference_steps,
                cfg_scale=params.cfg_scale,
                cfg_rescale=params.cfg_rescale,
                renorm_cfg=params.renorm_cfg,
                cfg_trunc_ratio=params.cfg_trunc_ratio,
                distilled_guidance=params.distilled_guidance,
                seed=params.seed,
            )
        )

    def close(self):
        self._engine.close()


def make_handler(batcher):
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
                image = batcher.submit(params)
            except Exception as e:
                self.send_error(500, str(e))
                return
            if isinstance(image, list):  # wan: a video = list of frames
                import os

                from vision_ft_tpu.utils.video import write_images_as_temp_video

                path = write_images_as_temp_video(image, fps=params.fps)
                try:
                    with open(path, "rb") as f:
                        data = f.read()
                finally:
                    os.unlink(path)
                ctype = "video/mp4"
            else:
                buffered = BytesIO()
                image.save(buffered, format="WEBP")
                data = buffered.getvalue()
                ctype = "image/webp"
            self.send_response(200)
            self.send_header("Content-Type", ctype)
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
@click.option("--family",
              type=click.Choice(
                  ["auraflow", "sdxl", "lumina2", "cogview4", "flux", "wan"]),
              default="auraflow")
@click.option("--deep-cache-interval", type=int, default=None,
              help="DeepCache full-pass interval (all served families)")
@click.option("--port", type=int, default=8123)
@click.option("--max-batch", type=int, default=4)
@click.option("--batch-window-ms", type=float, default=25.0)
@click.option("--no-batch-buckets", is_flag=True, default=False,
              help="run each group at its exact size instead of padding to "
                   "power-of-2 buckets (more compiled shapes)")
@click.option("--scheduler", type=click.Choice(["window", "continuous"]),
              default="window",
              help="window: collate compatible requests arriving within "
                   "--batch-window-ms; continuous: step-level slot pool "
                   "(sdxl/lumina2, fixed --pool-width x --pool-height)")
@click.option("--num-slots", type=int, default=4,
              help="continuous scheduler: latent slots in the pool")
@click.option("--pool-width", type=int, default=768)
@click.option("--pool-height", type=int, default=1024)
@click.option("--max-steps", type=int, default=50,
              help="continuous scheduler: schedule-table bound")
def main(
    config_path: str, peft_path: Optional[str], tokenizer_path: Optional[str],
    family: str, deep_cache_interval: Optional[int],
    port: int, max_batch: int, batch_window_ms: float, no_batch_buckets: bool,
    scheduler: str, num_slots: int, pool_width: int, pool_height: int,
    max_steps: int,
):
    print("Loading model...")
    model = T2IModel(config_path, peft_path, tokenizer_path, family=family,
                     deep_cache_interval=deep_cache_interval)
    if scheduler == "continuous":
        batcher = ContinuousScheduler(
            model, height=pool_height, width=pool_width,
            num_slots=num_slots, max_steps=max_steps,
        )
        print(f"Serving on :{port} (POST /predict, continuous batching, "
              f"{num_slots} slots @ {pool_width}x{pool_height})")
    else:
        batcher = MicroBatcher(model, max_batch=max_batch,
                               window_ms=batch_window_ms,
                               pad_to_bucket=not no_batch_buckets)
        print(f"Serving on :{port} (POST /predict, micro-batch <= {max_batch})")
    ThreadingHTTPServer(("0.0.0.0", port), make_handler(batcher)).serve_forever()


if __name__ == "__main__":
    main()
