"""Train config schema (YAML-compatible with the reference).

Behavioral spec: /root/reference/src/config.py — the same pydantic tree
(model/dataset stay dicts for two-stage validation by the workload class;
discriminated unions for saving/preview/peft; debug_mode levels), so
reference YAMLs are drop-in. TPU deltas:
  - ``trainer.torch_compile*`` accepted but ignored (everything is jit).
  - ``trainer.fp32_matmul_precision`` maps to jax default matmul precision.
  - new optional ``trainer.mesh`` {data,fsdp,tensor} sizes for SPMD.
"""

from __future__ import annotations

from pathlib import Path
from typing import Literal, Optional, Union

import yaml
from pydantic import BaseModel

from .dataset.preview import TextToImagePreviewConfig
from .modules.peft import PeftTargetConfig
from .preview import PreviewCallbackConfigAlias, PreviewStrategyConfig
from .saving import (
    ModelSavingCallbackConfgiAlias,
    ModelSavingStrategyConfig,
    SafetensorsSavingCallbackConfig,
)

PreviewDatasetAlias = TextToImagePreviewConfig


class OptimizerConfig(BaseModel):
    name: str = "torch.optim.AdamW"
    args: dict = {"lr": 1e-3}


class SchedulerConfig(BaseModel):
    name: str = "torch.optim.lr_scheduler.ConstantLR"
    args: dict = {}


class SavingConfig(BaseModel):
    strategy: ModelSavingStrategyConfig = ModelSavingStrategyConfig()
    callbacks: list[ModelSavingCallbackConfgiAlias] = [
        SafetensorsSavingCallbackConfig(name="model", save_dir="./output")
    ]
    rename_key_map: dict[str, str] = {}


class PreviewConfig(BaseModel):
    strategy: PreviewStrategyConfig = PreviewStrategyConfig()
    callbacks: list[PreviewCallbackConfigAlias] = []
    data: PreviewDatasetAlias


class TrackerConfig(BaseModel):
    project_name: str
    loggers: list[Literal["wandb", "tensorboard"]]


DEBUG_MODE_TYPE = Literal[False, "sanity_check", "1step", "dataset"]


class MeshConfigSchema(BaseModel):
    data: int = -1
    fsdp: int = 1
    tensor: int = 1
    # GPipe pipeline stages over the transformer stack (families with
    # set_pipeline: Lumina2 / AuraFlow / Flux / CogView4 / Wan); the
    # global batch splits into pipeline_microbatches per step
    pipe: int = 1
    pipeline_microbatches: int = 1


class TrainerConfig(BaseModel):
    debug_mode: DEBUG_MODE_TYPE = False

    # accepted for reference-YAML compat; jit is always on under jax
    torch_compile: bool = False
    torch_compile_args: dict = {}

    gradient_checkpointing: bool = False
    # what the remat policy SAVES across the fwd/bwd boundary when
    # gradient_checkpointing is on (nn.core.remat_layer):
    #   "activations" (default) — flash (out,lse,qkv) + tagged ff/residual/
    #     conv activations; fastest, ~2-3 GB extra at SDXL batch-4 @1024px
    #   "kernel"      — only the flash (out,lse) kernel outputs
    #   "none"        — plain full remat (memory-tightest; 6.8B+ bases)
    remat_saves: Literal["activations", "kernel", "none"] = "activations"
    # checkpoint uniform layer stacks in groups of N layers (nn.core.
    # set_remat_group): same recompute FLOPs, ÷N inter-layer boundary
    # saves, ×N backward working set — the fit for 6.8B+ stacks whose
    # per-layer boundaries alone exceed HBM (e.g. AuraFlow b4 @1024px)
    remat_group: int = 1
    gradient_accumulation_steps: int = 1

    clip_grad_norm: Optional[float] = None
    clip_grad_value: Optional[float] = None

    fp32_matmul_precision: Optional[Literal["highest", "high", "medium"]] = None
    allow_tf32: bool = False  # no-op on TPU (accepted for compat)

    mesh: MeshConfigSchema = MeshConfigSchema()

    # -- TPU-side auxiliary subsystems (SURVEY.md §5.1-5.3; the reference
    # has no tracing/NaN-checking/train-state checkpointing) -------------
    # jax.profiler trace capture over steps [profile_start_step,
    # profile_stop_step) written to profile_dir
    profile: bool = False
    profile_dir: str = "profiles"
    profile_start_step: int = 1
    profile_stop_step: int = 3

    # jax NaN checking (jax.config jax_debug_nans): every jitted step
    # re-runs un-jitted on NaN and raises at the producing primitive
    debug_nans: bool = False

    # Orbax full train-state checkpointing (trainable params + optimizer
    # state + step) for preemption recovery — the reference never
    # checkpoints optimizer state (SURVEY.md §5.3)
    state_checkpoint_dir: Optional[str] = None
    state_checkpoint_every_steps: int = 100
    resume_from_state_checkpoint: bool = True

    # Exponential moving average of the trainable params (beyond the
    # reference, which has no EMA): ema = ema*decay + p*(1-decay) after
    # every optimizer step; saving/preview then use the EMA weights.
    # Typical diffusion fine-tune values: 0.999-0.9999.
    ema_decay: Optional[float] = None


class TrainConfig(BaseModel):
    model: Union[dict, BaseModel]
    dataset: Union[dict, BaseModel]
    peft: Union[PeftTargetConfig, list[PeftTargetConfig], None] = None

    optimizer: OptimizerConfig = OptimizerConfig()
    scheduler: Optional[SchedulerConfig] = None
    saving: Optional[SavingConfig] = SavingConfig()
    preview: Optional[PreviewConfig] = None
    tracker: Optional[TrackerConfig] = None
    trainer: TrainerConfig = TrainerConfig()

    seed: int = 42
    num_train_epochs: int = 1

    def to_dict(self) -> dict:
        return self.model_dump()

    def save_to(self, dir: Union[Path, str], filename: str = "config.yaml") -> None:
        dir = Path(dir)
        dir.mkdir(parents=True, exist_ok=True)
        with open(dir / filename, "w") as f:
            yaml.dump(self.to_dict(), f)

    @staticmethod
    def from_config_file(path: str) -> "TrainConfig":
        with open(path) as f:
            config = yaml.safe_load(f)
        return TrainConfig.model_validate(config, strict=True)
