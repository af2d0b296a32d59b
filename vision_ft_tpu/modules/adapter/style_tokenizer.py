"""Style tokenizer adapter heads.

Behavioral spec: /root/reference/src/modules/adapter/style_tokenizer.py —
a frozen vision backbone's features become N ``<|style|>`` token
EMBEDDINGS that are scattered into the CLIP text towers' input embedding
at the style-token positions (unlike PFG, which concatenates to the
context). Projector shapes: linear (ZERO-initialized), MLP (xavier), and
a perceiver resampler with xavier transformer weights and a ZERO
proj_out (style_tokenizer.py:229-252).

Keys mirror the torch layout; the checkpoint file uses the
projector_1./projector_2./vision_encoder. prefixes
(models/sdxl/adapter/style_tokenizer.py:481-510).
"""

from __future__ import annotations

from typing import Literal, NamedTuple, Optional

import jax
import jax.numpy as jnp
from pydantic import BaseModel

from ...nn import Linear, ModuleDict
from .prompt_free import (
    PerceiverTransformer,  # identical block in both reference files
    ResamplerImageProjector as _PFGResampler,
    _xavier_normal,
)


class ProjectionOutput(NamedTuple):
    style_tokens: jax.Array


class LinearImageProjector(ModuleDict):
    """Zero-initialized linear head (reference style_tokenizer.py:19-62)."""

    def __init__(self, in_features: int, out_features: int = 768, num_style_tokens: int = 4):
        self.out_features = out_features
        self.num_style_tokens = num_style_tokens
        super().__init__({"projection": Linear(in_features, out_features * num_style_tokens)})

    def init(self, key, dtype=jnp.float32):
        params = super().init(key, dtype)
        params["projection"]["weight"] = jnp.zeros_like(params["projection"]["weight"])
        params["projection"]["bias"] = jnp.zeros_like(params["projection"]["bias"])
        return params

    def __call__(self, params, features: jax.Array) -> ProjectionOutput:
        tokens = self["projection"](params["projection"], features)
        return ProjectionOutput(
            tokens.reshape(-1, self.num_style_tokens, self.out_features)
        )


class MLPImageProjector(ModuleDict):
    """(reference style_tokenizer.py:65-108; hidden dim == in_features)."""

    def __init__(self, in_features: int, out_features: int = 768, num_style_tokens: int = 4):
        self.out_features = out_features
        self.num_style_tokens = num_style_tokens
        super().__init__(
            {
                "mlp": ModuleDict(
                    {
                        "0": Linear(in_features, in_features),
                        "2": Linear(in_features, out_features * num_style_tokens),
                    }
                )
            }
        )

    def init(self, key, dtype=jnp.float32):
        params = super().init(key, dtype)
        k0, k2 = jax.random.split(key)
        for sub, k in (("0", k0), ("2", k2)):
            params["mlp"][sub]["weight"] = _xavier_normal(
                k, params["mlp"][sub]["weight"].shape, dtype
            )
            params["mlp"][sub]["bias"] = jnp.zeros_like(params["mlp"][sub]["bias"])
        return params

    def __call__(self, params, features: jax.Array) -> ProjectionOutput:
        h = self["mlp"]["0"](params["mlp"]["0"], features)
        h = jax.nn.silu(h)
        tokens = self["mlp"]["2"](params["mlp"]["2"], h)
        return ProjectionOutput(
            tokens.reshape(-1, self.num_style_tokens, self.out_features)
        )


class ResamplerImageProjector(_PFGResampler):
    """(reference style_tokenizer.py:193-282): ``style_query`` param name,
    xavier transformer init, zero proj_out."""

    query_key = "style_query"
    output_cls = ProjectionOutput
    transformer_init = "xavier"
    proj_out_init = "zeros"

    def __init__(
        self,
        in_features: int,
        out_features: int = 768,
        num_style_tokens: int = 4,
        num_layers: int = 1,
        num_heads: int = 8,
        mlp_ratio: float = 4.0,
        attn_implementation: str = "xla",
    ):
        super().__init__(
            in_features, out_features, num_style_tokens,
            num_layers=num_layers, num_heads=num_heads, mlp_ratio=mlp_ratio,
            attn_implementation=attn_implementation,
        )


class StyleTokenizerConfig(BaseModel):
    """(reference style_tokenizer.py:285-303)."""

    style_token: str = "<|style|>"
    num_style_tokens: int = 4
    image_size: int = 512
    background_color: int = 0

    projector_type: Literal["linear", "mlp", "resampler"] = "mlp"
    projector_args: dict = {}

    checkpoint_weight: Optional[str] = None

    image_encoder: dict = {}  # AutoModelConfig fields (models/auto.py)
    image_mean: list[float] = [0.5, 0.5, 0.5]
    image_std: list[float] = [0.5, 0.5, 0.5]
    feature_dim: int = 768


class StyleTokenizerManager:
    """(reference StyleTokenizerManager, style_tokenizer.py:306-351)."""

    def __init__(self, adapter_config: StyleTokenizerConfig):
        self.adapter_config = adapter_config

    def get_projector(self, out_features: int):
        cfg = self.adapter_config
        args = cfg.projector_args
        if cfg.projector_type == "linear":
            return LinearImageProjector(
                cfg.feature_dim, out_features, cfg.num_style_tokens
            )
        if cfg.projector_type == "mlp":
            return MLPImageProjector(
                cfg.feature_dim, out_features, cfg.num_style_tokens
            )
        if cfg.projector_type == "resampler":
            return ResamplerImageProjector(
                cfg.feature_dim, out_features, cfg.num_style_tokens,
                num_layers=args.get("num_layers", 1),
                num_heads=args.get("num_heads", 8),
                mlp_ratio=args.get("mlp_ratio", 4.0),
            )
        raise ValueError(f"Invalid projector type: {cfg.projector_type}")
