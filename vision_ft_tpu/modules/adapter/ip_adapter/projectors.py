"""IP-Adapter image projectors (reference linear.py / mlp.py / resampler.py).

Param-tree keys flatten to the reference torch state-dict layouts
(proj.weight / mlp.0.weight / latents, proj_in.weight, layers.N.0...), so
projector safetensors interop directly; shape-based auto-detection follows
the reference (ip_adapter/__init__.py:216-240).
"""

from __future__ import annotations

from typing import Literal

import jax
import jax.numpy as jnp

from ....nn import LayerNorm, Linear, Module, ModuleDict, RMSNorm, split_keys
from ....ops.attention import scaled_dot_product_attention

NORMALIZATION_TYPES = Literal["layernorm", "layer", "rmsnorm", "rms"]


def get_norm_layer(normalization: str, dim: int):
    if normalization.lower() in ("layernorm", "layer"):
        return LayerNorm(dim)
    if normalization.lower() in ("rmsnorm", "rms"):
        return RMSNorm(dim)
    raise ValueError(f"Unsupported normalization type: {normalization}")


class LinearImageProjector(ModuleDict):
    def __init__(self, in_features: int, cross_attention_dim: int = 2048,
                 num_ip_tokens: int = 4, normalization: str = "layernorm"):
        self.in_features = in_features
        self.cross_attention_dim = cross_attention_dim
        self.num_ip_tokens = num_ip_tokens
        super().__init__(
            {
                "proj": Linear(in_features, cross_attention_dim * num_ip_tokens),
                "norm": get_norm_layer(normalization, cross_attention_dim),
            }
        )

    def init(self, key, dtype=jnp.float32):
        params = super().init(key, dtype)
        # reference init: U(0, 0.02) weight, zero bias (linear.py:32-42)
        params["proj"]["weight"] = jax.random.uniform(
            key, params["proj"]["weight"].shape, dtype, 0.0, 0.02
        )
        params["proj"]["bias"] = jnp.zeros_like(params["proj"]["bias"])
        return params

    @classmethod
    def config_from_pretrained(cls, state_dict) -> dict:
        in_features = state_dict["proj.weight"].shape[1]
        cross_attention_dim = state_dict["norm.weight"].shape[0]
        return dict(
            in_features=in_features,
            cross_attention_dim=cross_attention_dim,
            num_ip_tokens=state_dict["proj.weight"].shape[0] // cross_attention_dim,
            normalization="layer" if "norm.bias" in state_dict else "rms",
        )

    def __call__(self, params, features, *args, **kwargs):
        tokens = self["proj"](params["proj"], features)
        tokens = tokens.reshape(-1, self.num_ip_tokens, self.cross_attention_dim)
        return self["norm"](params["norm"], tokens)


class MLPImageProjector(ModuleDict):
    def __init__(self, in_features: int, mlp_ratio: float = 1.0,
                 cross_attention_dim: int = 768, num_style_tokens: int = 4,
                 normalization: str = "layernorm"):
        self.cross_attention_dim = cross_attention_dim
        self.num_style_tokens = num_style_tokens
        hidden = int(in_features * mlp_ratio)
        super().__init__(
            {
                "mlp": ModuleDict(
                    {
                        "0": Linear(in_features, hidden),
                        "2": Linear(hidden, cross_attention_dim * num_style_tokens),
                    }
                ),
                "norm": get_norm_layer(normalization, cross_attention_dim),
            }
        )

    def init(self, key, dtype=jnp.float32):
        params = super().init(key, dtype)
        k0, k2 = jax.random.split(key)
        for name, k in (("0", k0), ("2", k2)):
            params["mlp"][name]["weight"] = (
                jax.random.normal(k, params["mlp"][name]["weight"].shape, dtype) * 0.02
            )
            params["mlp"][name]["bias"] = jnp.zeros_like(params["mlp"][name]["bias"])
        return params

    @classmethod
    def config_from_pretrained(cls, state_dict) -> dict:
        in_features = state_dict["mlp.0.weight"].shape[1]
        cross_attention_dim = state_dict["norm.weight"].shape[0]
        return dict(
            in_features=in_features,
            mlp_ratio=state_dict["mlp.0.weight"].shape[0] / in_features,
            cross_attention_dim=cross_attention_dim,
            num_style_tokens=state_dict["mlp.2.weight"].shape[0] // cross_attention_dim,
            normalization="layer" if "norm.bias" in state_dict else "rms",
        )

    def __call__(self, params, features, *args, **kwargs):
        h = self["mlp"]["0"](params["mlp"]["0"], features)
        h = jax.nn.gelu(h, approximate=False)
        tokens = self["mlp"]["2"](params["mlp"]["2"], h)
        tokens = tokens.reshape(-1, self.num_style_tokens, self.cross_attention_dim)
        return self["norm"](params["norm"], tokens)


class PerceiverAttention(ModuleDict):
    def __init__(self, in_features: int, num_heads: int,
                 normalization: str = "layernorm", qk_norm: bool = False):
        self.in_features = in_features
        self.num_heads = num_heads
        self.head_dim = in_features // num_heads
        self.qk_norm = qk_norm
        children = {
            "norm1": get_norm_layer(normalization, in_features),
            "norm2": get_norm_layer(normalization, in_features),
            "to_q": Linear(in_features, in_features, bias=False),
            "to_kv": Linear(in_features, in_features * 2, bias=False),
            "to_out": Linear(in_features, in_features, bias=False),
        }
        if qk_norm:
            children["norm_q"] = get_norm_layer(normalization, self.head_dim)
            children["norm_k"] = get_norm_layer(normalization, self.head_dim)
        super().__init__(children)

    def __call__(self, params, image_features, latents):
        b = latents.shape[0]
        image_features = self["norm1"](params["norm1"], image_features)
        latents = self["norm2"](params["norm2"], latents)
        query = self["to_q"](params["to_q"], latents)
        kv_input = jnp.concatenate([image_features, latents], axis=1)
        key, value = jnp.split(self["to_kv"](params["to_kv"], kv_input), 2, axis=-1)

        def heads(t):
            return t.reshape(b, t.shape[1], self.num_heads, self.head_dim).transpose(0, 2, 1, 3)

        q, k, v = heads(query), heads(key), heads(value)
        if self.qk_norm:
            q = self["norm_q"](params["norm_q"], q)
            k = self["norm_k"](params["norm_k"], k)
        attn = scaled_dot_product_attention(q, k, v)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, -1, self.in_features)
        return self["to_out"](params["to_out"], attn)


class _FeedForward(ModuleDict):
    """norm -> linear -> gelu -> linear (torch Sequential keys 0,1,3)."""

    def __init__(self, in_features: int, mlp_ratio: float, normalization: str):
        super().__init__(
            {
                "0": get_norm_layer(normalization, in_features),
                "1": Linear(in_features, int(in_features * mlp_ratio), bias=False),
                "3": Linear(int(in_features * mlp_ratio), in_features, bias=False),
            }
        )

    def __call__(self, params, x):
        h = self["0"](params["0"], x)
        h = self["1"](params["1"], h)
        h = jax.nn.gelu(h, approximate=False)
        return self["3"](params["3"], h)


class ResamplerProjector(Module):
    """Perceiver resampler (reference resampler.py:86-273)."""

    def __init__(self, in_features: int, num_heads: int = 8, mlp_ratio: float = 4.0,
                 cross_attention_dim: int = 768, num_ip_tokens: int = 4, depth: int = 4,
                 normalization: str = "layernorm", qk_norm: bool = False):
        dim = cross_attention_dim
        self.num_ip_tokens = num_ip_tokens
        self.cross_attention_dim = dim
        self.proj_in = Linear(in_features, dim)
        self.proj_out = Linear(dim, dim)
        self.norm_out = get_norm_layer(normalization, dim)
        self.layers = [
            (
                PerceiverAttention(dim, num_heads, normalization, qk_norm),
                _FeedForward(dim, mlp_ratio, normalization),
            )
            for _ in range(depth)
        ]

    def init(self, key, dtype=jnp.float32):
        keys = split_keys(key, ["latents", "in", "out", "norm", "layers"])
        lkeys = jax.random.split(keys["layers"], max(len(self.layers), 1))
        params = {
            "latents": jax.random.normal(
                keys["latents"], (1, self.num_ip_tokens, self.cross_attention_dim), dtype
            ) / self.cross_attention_dim**0.5,
            "proj_in": self.proj_in.init(keys["in"], dtype),
            "proj_out": self.proj_out.init(keys["out"], dtype),
            "norm_out": self.norm_out.init(keys["norm"], dtype),
            "layers": {
                str(i): {
                    "0": attn.init(jax.random.fold_in(k, 0), dtype),
                    "1": ff.init(jax.random.fold_in(k, 1), dtype),
                }
                for i, ((attn, ff), k) in enumerate(zip(self.layers, lkeys))
            },
        }
        return params

    @classmethod
    def config_from_pretrained(cls, state_dict, num_heads: int = 8) -> dict:
        in_features = state_dict["proj_in.weight"].shape[1]
        cross_attention_dim = state_dict["proj_out.weight"].shape[0]
        depth = len({k.split(".")[1] for k in state_dict if k.startswith("layers.")})
        return dict(
            in_features=in_features,
            num_heads=num_heads,
            mlp_ratio=state_dict["layers.0.1.1.weight"].shape[0] / cross_attention_dim,
            cross_attention_dim=cross_attention_dim,
            num_ip_tokens=state_dict["latents"].shape[1],
            depth=depth,
            normalization="layer" if "norm_out.bias" in state_dict else "rms",
            qk_norm="layers.0.0.norm_q.weight" in state_dict,
        )

    def __call__(self, params, image_features, *args, **kwargs):
        b = image_features.shape[0]
        latents = jnp.broadcast_to(
            params["latents"], (b,) + params["latents"].shape[1:]
        ).astype(image_features.dtype)
        image_features = self.proj_in(params["proj_in"], image_features)
        for i, (attn, ff) in enumerate(self.layers):
            lp = params["layers"][str(i)]
            latents = attn(lp["0"], image_features, latents) + latents
            latents = ff(lp["1"], latents) + latents
        latents = self.proj_out(params["proj_out"], latents)
        return self.norm_out(params["norm_out"], latents)


def detect_projector_type(state_dict) -> str:
    if "proj.weight" in state_dict:
        return "linear"
    if "mlp.0.weight" in state_dict:
        return "mlp"
    if "latents" in state_dict and "proj_in.weight" in state_dict:
        return "resampler"
    if "ip_tokens" in state_dict and "blocks.0.norm_out.weight" in state_dict:
        return "image_text"
    raise ValueError("Unknown projector type in state_dict")


def load_projector_from_state_dict(state_dict, **kwargs):
    """Build a projector module + params from a flat adapter state dict."""
    from ....nn import unflatten_params

    projector_type = detect_projector_type(state_dict)
    if projector_type == "linear":
        module = LinearImageProjector(**LinearImageProjector.config_from_pretrained(state_dict))
    elif projector_type == "mlp":
        module = MLPImageProjector(**MLPImageProjector.config_from_pretrained(state_dict))
    elif projector_type == "resampler":
        module = ResamplerProjector(
            **ResamplerProjector.config_from_pretrained(state_dict, **kwargs)
        )
    else:
        raise NotImplementedError(f"projector type {projector_type} not implemented")
    return module, unflatten_params(dict(state_dict))
