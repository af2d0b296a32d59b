"""IP-Adapter: image-prompt conditioning.

Reference: /root/reference/src/modules/adapter/ip_adapter/ — config with
projector/variant enums, manager with cross-attn-only odd indexing and
projector factory, four projector families. TPU-native: projectors are
functional Modules; the manager maps adapter params between the live tree
and the reference's ``ip_adapter.{odd}.{name}`` on-disk keys.
"""

from __future__ import annotations

from typing import Literal, Optional, Union

import jax
from pydantic import BaseModel

from ...peft import PeftConfigUnion
from ..util import Adapter, AdapterManager
from .projectors import (
    ImageTextProjector,
    LinearImageProjector,
    MLPImageProjector,
    ResamplerProjector,
    detect_projector_type,
    load_projector_from_state_dict,
)

PROJECTOR_TYPE = Literal["linear", "mlp", "resampler", "image_text"]

IP_ADAPTER_VARIANT = Literal[
    "original", "peft", "adaln_zero", "tanh_gate", "gate", "flamingo", "time_gate"
]


class AutoModelConfig(BaseModel):
    """Image-encoder backbone pointer (reference src/models/auto.py).

    The reference instantiates transformers/timm torch models; in this
    build the encoder is any callable (PIL/array batch -> (B, S, D) or
    (B, D) features) resolved at the model-with-adapter layer — configs
    carry the same fields for YAML compatibility."""

    type: str = "timm"
    model_name: str = "hf_hub:timm/vit_base_patch16_siglip_384.v2_webli"
    pretrained: bool = True
    feature_type: Literal["hidden_state", "pooler_output"] = "hidden_state"
    hidden_state_index: int = -2


class TimmModelConfig(AutoModelConfig):
    type: str = "timm"


class TransformersModelConfig(AutoModelConfig):
    type: str = "transformers"


class IPAdapterConfig(BaseModel):
    ip_scale: float = 1.0
    num_ip_tokens: int = 4
    image_size: int = 384
    background_color: int = 0

    projector_type: PROJECTOR_TYPE = "mlp"
    projector_args: dict = {}
    dtype: str = "bfloat16"

    checkpoint_weight: Optional[str] = None

    image_encoder: AutoModelConfig = TimmModelConfig()
    image_mean: list[float] = [0.5, 0.5, 0.5]
    image_std: list[float] = [0.5, 0.5, 0.5]
    color_channel: Literal["rgb", "bgr"] = "rgb"
    feature_dim: int = 768

    variant: IP_ADAPTER_VARIANT = "original"

    peft: Optional[PeftConfigUnion] = None

    skip_zero_tokens: bool = False
    attn_renorm: bool = False


class IPAdapterManager(AdapterManager):
    adapter_config: IPAdapterConfig

    def __init__(self, adapter_class: type[Adapter], adapter_config: IPAdapterConfig):
        super().__init__(adapter_class, adapter_config)

    def get_projector(self, attention_dim: int):
        cfg = self.adapter_config
        args = cfg.projector_args
        if cfg.projector_type == "linear":
            return LinearImageProjector(
                in_features=cfg.feature_dim,
                cross_attention_dim=attention_dim,
                num_ip_tokens=cfg.num_ip_tokens,
            )
        if cfg.projector_type == "mlp":
            return MLPImageProjector(
                in_features=cfg.feature_dim,
                mlp_ratio=args.get("mlp_ratio", 1.0),
                cross_attention_dim=attention_dim,
                num_style_tokens=cfg.num_ip_tokens,
            )
        if cfg.projector_type == "resampler":
            return ResamplerProjector(
                in_features=cfg.feature_dim,
                num_heads=args.get("num_heads", 8),
                mlp_ratio=args.get("mlp_ratio", 4.0),
                cross_attention_dim=attention_dim,
                num_ip_tokens=cfg.num_ip_tokens,
                depth=args.get("depth", 4),
                normalization=args.get("normalization", "layernorm"),
                qk_norm=args.get("qk_norm", False),
            )
        if cfg.projector_type == "image_text":
            # reference __init__.py:160-175: text_dim defaults to SDXL's
            # context dim, hidden_dim is the cross-attention dim
            return ImageTextProjector(
                image_dim=cfg.feature_dim,
                text_dim=args.get("text_dim", 2048),
                hidden_dim=attention_dim,
                num_heads=args.get("num_heads", 8),
                num_blocks=args.get("depth", 4),
                mlp_ratio=args.get("mlp_ratio", 4.0),
                num_ip_tokens=cfg.num_ip_tokens,
            )
        raise NotImplementedError(
            f"Projector type {cfg.projector_type} not implemented."
        )


__all__ = [
    "AutoModelConfig",
    "TimmModelConfig",
    "TransformersModelConfig",
    "IPAdapterConfig",
    "IPAdapterManager",
    "IP_ADAPTER_VARIANT",
    "PROJECTOR_TYPE",
    "ImageTextProjector",
    "LinearImageProjector",
    "MLPImageProjector",
    "ResamplerProjector",
    "detect_projector_type",
    "load_projector_from_state_dict",
]
