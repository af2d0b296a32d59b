"""Prompt-Free Generation (PFG) adapter heads.

Behavioral spec: /root/reference/src/modules/adapter/prompt_free.py — a
frozen vision backbone's features are projected into N pseudo text
tokens that are CONCATENATED to the (possibly empty) prompt context
along the sequence axis; the base UNet is untouched. Three projector
shapes: linear, MLP (ratio 4), and a perceiver resampler whose learned
query cross-attends to patch features (kv = [features; query]).

Param-tree keys flatten to the reference torch layout
(projection.*, mlp.{0,2}.*, image_query/proj_in/transformer.N.{to_q,...,
mlp.0,mlp.2}/proj_out.*).
"""

from __future__ import annotations

from typing import Literal, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from pydantic import BaseModel

from ...nn import LayerNorm, Linear, Module, ModuleDict, split_keys
from ...ops.attention import scaled_dot_product_attention
from ..peft import PeftConfigUnion  # noqa: F401  (config surface parity)


class ProjectionOutput(NamedTuple):
    image_tokens: jax.Array


def _xavier_normal(key, shape, dtype):
    fan_out, fan_in = shape
    std = float(np.sqrt(2.0 / (fan_in + fan_out)))
    return std * jax.random.normal(key, shape, dtype)


class LinearImageProjector(ModuleDict):
    """(reference prompt_free.py:20-61)."""

    def __init__(self, in_features: int, out_features: int = 768, num_image_tokens: int = 4):
        self.out_features = out_features
        self.num_image_tokens = num_image_tokens
        super().__init__({"projection": Linear(in_features, out_features * num_image_tokens)})

    def init(self, key, dtype=jnp.float32):
        params = super().init(key, dtype)
        # xavier-normal weight, zero bias (the reference's init_weights has
        # a self.mlp typo, prompt_free.py:38-43; the intent is xavier+zeros)
        params["projection"]["weight"] = _xavier_normal(
            key, params["projection"]["weight"].shape, dtype
        )
        params["projection"]["bias"] = jnp.zeros_like(params["projection"]["bias"])
        return params

    def __call__(self, params, features: jax.Array) -> ProjectionOutput:
        tokens = self["projection"](params["projection"], features)
        return ProjectionOutput(
            tokens.reshape(-1, self.num_image_tokens, self.out_features)
        )


class MLPImageProjector(ModuleDict):
    """(reference prompt_free.py:64-104)."""

    def __init__(
        self,
        in_features: int,
        out_features: int = 768,
        num_image_tokens: int = 4,
        mlp_ratio: float = 4.0,
    ):
        self.out_features = out_features
        self.num_image_tokens = num_image_tokens
        inner = int(in_features * mlp_ratio)
        super().__init__(
            {
                "mlp": ModuleDict(
                    {
                        "0": Linear(in_features, inner),
                        "2": Linear(inner, out_features * num_image_tokens),
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
            tokens.reshape(-1, self.num_image_tokens, self.out_features)
        )


class PerceiverTransformer(ModuleDict):
    """Query-to-features cross attention block with kv = [features; query]
    (reference prompt_free.py:107-185 / style_tokenizer.py:110-190 —
    identical module, shared here)."""

    def __init__(
        self,
        in_features: int,
        num_heads: int,
        mlp_ratio: float = 4.0,
        attention_backend: str = "xla",
    ):
        self.in_features = in_features
        self.num_heads = num_heads
        self.head_dim = in_features // num_heads
        self.backend = attention_backend
        inner = int(in_features * mlp_ratio)
        super().__init__(
            {
                "norm_in_1": LayerNorm(in_features, eps=1e-6, elementwise_affine=False),
                "norm_in_2": LayerNorm(in_features, eps=1e-6, elementwise_affine=False),
                "to_q": Linear(in_features, in_features, bias=False),
                "to_k": Linear(in_features, in_features, bias=False),
                "to_v": Linear(in_features, in_features, bias=False),
                "to_out": Linear(in_features, in_features),
                "norm_out": LayerNorm(in_features, eps=1e-6, elementwise_affine=False),
                "mlp": ModuleDict(
                    {"0": Linear(in_features, inner), "2": Linear(inner, in_features)}
                ),
            }
        )

    def _attention(self, params, query_tokens, hidden_states):
        q_in = self["norm_in_1"]({}, query_tokens)
        h_in = self["norm_in_2"]({}, hidden_states)
        kv_input = jnp.concatenate([h_in, q_in], axis=1)

        def heads(t):
            b, s, _ = t.shape
            return t.reshape(b, s, self.num_heads, self.head_dim).transpose(0, 2, 1, 3)

        q = heads(self["to_q"](params["to_q"], q_in))
        k = heads(self["to_k"](params["to_k"], kv_input))
        v = heads(self["to_v"](params["to_v"], kv_input))
        attn = scaled_dot_product_attention(q, k, v, backend=self.backend)
        b, h, s, d = attn.shape
        attn = attn.transpose(0, 2, 1, 3).reshape(b, s, h * d)
        attn = self["to_out"](params["to_out"], attn)
        return self["norm_out"]({}, attn)

    def __call__(self, params, query_tokens, hidden_states):
        query_tokens = self._attention(params, query_tokens, hidden_states) + query_tokens
        h = self["mlp"]["0"](params["mlp"]["0"], query_tokens)
        h = jax.nn.silu(h)
        h = self["mlp"]["2"](params["mlp"]["2"], h)
        return h + query_tokens


class ResamplerImageProjector(Module):
    """(reference prompt_free.py:187-266). ``query_key`` parameterizes the
    learned-query param name so the style variant reuses this class with
    its ``style_query`` key."""

    query_key = "image_query"
    output_cls = ProjectionOutput
    # (weight_init, proj_out_init): pfg uses normal(0.02); style uses
    # xavier weights + ZERO proj_out (style_tokenizer.py:229-252)
    transformer_init: str = "normal002"
    proj_out_init: str = "normal002"

    def __init__(
        self,
        in_features: int,
        out_features: int = 768,
        num_image_tokens: int = 4,
        num_layers: int = 1,
        num_heads: int = 8,
        mlp_ratio: float = 4.0,
        attn_implementation: str = "xla",
    ):
        self.out_features = out_features
        self.num_tokens = num_image_tokens
        self.proj_in = Linear(in_features, out_features)
        self.transformer = [
            PerceiverTransformer(out_features, num_heads, mlp_ratio, attn_implementation)
            for _ in range(num_layers)
        ]
        self.norm_out = LayerNorm(out_features, eps=1e-6, elementwise_affine=False)
        self.proj_out = Linear(out_features, out_features)

    def _init_linear_weight(self, key, shape, dtype, kind):
        if kind == "normal002":
            return 0.02 * jax.random.normal(key, shape, dtype)
        return _xavier_normal(key, shape, dtype)

    def init(self, key, dtype=jnp.float32):
        names = ["query", "proj_in", "proj_out"] + [
            f"transformer.{i}" for i in range(len(self.transformer))
        ]
        keys = split_keys(key, names)
        params = {
            self.query_key: jax.random.normal(
                keys["query"], (1, self.num_tokens, self.out_features), dtype
            )
            / self.out_features**0.5,
            "proj_in": self.proj_in.init(keys["proj_in"], dtype),
            "transformer": {},
            "proj_out": self.proj_out.init(keys["proj_out"], dtype),
        }
        for i, layer in enumerate(self.transformer):
            p = layer.init(keys[f"transformer.{i}"], dtype)
            lk = keys[f"transformer.{i}"]
            for name in ("to_q", "to_k", "to_v", "to_out"):
                lk, sub = jax.random.split(lk)
                p[name]["weight"] = self._init_linear_weight(
                    sub, p[name]["weight"].shape, dtype, self.transformer_init
                )
            for name in ("0", "2"):
                lk, sub = jax.random.split(lk)
                p["mlp"][name]["weight"] = self._init_linear_weight(
                    sub, p["mlp"][name]["weight"].shape, dtype, self.transformer_init
                )
                p["mlp"][name]["bias"] = jnp.zeros_like(p["mlp"][name]["bias"])
            if "bias" in p["to_out"]:
                p["to_out"]["bias"] = jnp.zeros_like(p["to_out"]["bias"])
            params["transformer"][str(i)] = p
        if self.proj_out_init == "zeros":
            params["proj_out"]["weight"] = jnp.zeros_like(params["proj_out"]["weight"])
        else:
            params["proj_out"]["weight"] = 0.02 * jax.random.normal(
                keys["proj_out"], params["proj_out"]["weight"].shape, dtype
            )
        params["proj_out"]["bias"] = jnp.zeros_like(params["proj_out"]["bias"])
        return params

    def __call__(self, params, features: jax.Array):
        if features.ndim == 2:
            features = features[:, None, :]
        batch = features.shape[0]
        query = jnp.broadcast_to(
            params[self.query_key].astype(features.dtype),
            (batch, self.num_tokens, self.out_features),
        )
        h = self.proj_in(params["proj_in"], features)
        for i, layer in enumerate(self.transformer):
            query = layer(params["transformer"][str(i)], query, h)
        tokens = self.proj_out(params["proj_out"], query)
        tokens = self.norm_out({}, tokens)
        return self.output_cls(tokens)


class PFGConfig(BaseModel):
    """(reference prompt_free.py:269-290)."""

    num_image_tokens: int = 4
    image_size: int = 384
    background_color: int = 0

    projector_type: Literal["linear", "mlp", "resampler"] = "mlp"
    projector_args: dict = {}

    checkpoint_weight: Optional[str] = None

    image_encoder: dict = {}  # AutoModelConfig fields (models/auto.py)
    image_mean: list[float] = [0.5, 0.5, 0.5]
    image_std: list[float] = [0.5, 0.5, 0.5]
    color_channel: Literal["rgb", "bgr"] = "rgb"
    feature_dim: int = 768


class PFGManager:
    """(reference PFGManager, prompt_free.py:293-345)."""

    def __init__(self, adapter_config: PFGConfig):
        self.adapter_config = adapter_config

    def get_projector(self, out_features: int):
        cfg = self.adapter_config
        args = cfg.projector_args
        if cfg.projector_type == "linear":
            return LinearImageProjector(
                cfg.feature_dim, out_features, cfg.num_image_tokens
            )
        if cfg.projector_type == "mlp":
            return MLPImageProjector(
                cfg.feature_dim, out_features, cfg.num_image_tokens,
                mlp_ratio=args.get("mlp_ratio", 4.0),
            )
        if cfg.projector_type == "resampler":
            return ResamplerImageProjector(
                cfg.feature_dim, out_features, cfg.num_image_tokens,
                num_layers=args.get("num_layers", 1),
                num_heads=args.get("num_heads", 8),
                mlp_ratio=args.get("mlp_ratio", 4.0),
            )
        raise ValueError(f"Invalid projector type: {cfg.projector_type}")
