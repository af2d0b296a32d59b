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


class _IPContextAttention(ModuleDict):
    """Perceiver attention: Q = ip tokens, KV = concat(ip, context).

    Reference ``TextIPAttention`` / ``ImageIPAttention``
    (ip_adapter/image_text.py:87-205) are structurally identical — RMSNorm
    pre-norms on both streams, bias-free q/k/v/out projections, RMSNorm
    QK-norm over the head dim, kv from ``cat([ip, context])``.
    ``context_norm_name`` reproduces the on-disk key of the context
    pre-norm ('norm_image' for ImageIPAttention, 'norm_text' for
    TextIPAttention)."""

    def __init__(self, dim: int, num_heads: int, context_norm_name: str):
        self.dim = dim
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.context_norm_name = context_norm_name
        super().__init__(
            {
                context_norm_name: RMSNorm(dim),
                "norm_ip": RMSNorm(dim),
                "norm_q": RMSNorm(self.head_dim),
                "norm_k": RMSNorm(self.head_dim),
                "to_q": Linear(dim, dim, bias=False),
                "to_k": Linear(dim, dim, bias=False),
                "to_v": Linear(dim, dim, bias=False),
                "to_out": Linear(dim, dim, bias=False),
            }
        )

    def __call__(self, params, context, ip_features):
        b = ip_features.shape[0]
        context = self[self.context_norm_name](params[self.context_norm_name], context)
        ip_features = self["norm_ip"](params["norm_ip"], ip_features)
        query = self["to_q"](params["to_q"], ip_features)
        kv_input = jnp.concatenate([ip_features, context], axis=1)
        key = self["to_k"](params["to_k"], kv_input)
        value = self["to_v"](params["to_v"], kv_input)

        def heads(t):
            return t.reshape(b, t.shape[1], self.num_heads, self.head_dim).transpose(0, 2, 1, 3)

        q, k, v = heads(query), heads(key), heads(value)
        q = self["norm_q"](params["norm_q"], q)
        k = self["norm_k"](params["norm_k"], k)
        attn = scaled_dot_product_attention(q, k, v)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, -1, self.dim)
        return self["to_out"](params["to_out"], attn)


class ImageTextTransformerBlock(ModuleDict):
    """One image_text block (reference ImageTextTransformer,
    ip_adapter/image_text.py:208-279).

    NOTE the reference's attn1/attn2 naming is swapped relative to usage:
    forward first runs ``attn2`` (declared TextIPAttention) against the
    IMAGE features, then ``attn1`` (declared ImageIPAttention) against the
    TEXT features (image_text.py:248-274). We replicate both the key
    layout and the execution order so checkpoints interop byte-for-byte."""

    def __init__(self, hidden_dim: int, num_heads: int, mlp_ratio: float = 4.0):
        mlp_hidden = int(hidden_dim * mlp_ratio)
        super().__init__(
            {
                "attn1": _IPContextAttention(hidden_dim, num_heads, "norm_image"),
                "norm1": RMSNorm(hidden_dim),
                "attn2": _IPContextAttention(hidden_dim, num_heads, "norm_text"),
                "norm2": RMSNorm(hidden_dim),
                # torch Sequential(Linear, SiLU, Linear) -> keys mlp.0 / mlp.2
                "mlp": ModuleDict(
                    {"0": Linear(hidden_dim, mlp_hidden), "2": Linear(mlp_hidden, hidden_dim)}
                ),
                "norm_out": RMSNorm(hidden_dim),
            }
        )

    def __call__(self, params, image_features, text_features, ip_features):
        attn = self["attn2"](params["attn2"], image_features, ip_features)
        ip_features = self["norm2"](params["norm2"], attn + ip_features)
        attn = self["attn1"](params["attn1"], text_features, ip_features)
        ip_features = self["norm1"](params["norm1"], attn + ip_features)
        h = self["mlp"]["0"](params["mlp"]["0"], ip_features)
        h = jax.nn.silu(h)
        h = self["mlp"]["2"](params["mlp"]["2"], h)
        return self["norm_out"](params["norm_out"], ip_features + h)


class ImageTextProjector(Module):
    """Joint image+text -> ip-token projector (reference
    ip_adapter/image_text.py:282-440): learned ip tokens iteratively
    cross-attend to projected image then text features through
    ``num_blocks`` transformer blocks.

    Unlike the other projectors this one consumes the prompt embeddings
    too — ``__call__(params, image_features, text_features)``."""

    def __init__(self, image_dim: int, text_dim: int, hidden_dim: int,
                 num_heads: int, num_blocks: int = 6, mlp_ratio: float = 4.0,
                 num_ip_tokens: int = 64):
        self.image_dim = image_dim
        self.text_dim = text_dim
        self.hidden_dim = hidden_dim
        self.num_heads = num_heads
        self.num_ip_tokens = num_ip_tokens
        self.image_proj_in = Linear(image_dim, hidden_dim)
        self.text_proj_in = Linear(text_dim, hidden_dim)
        self.blocks = [
            ImageTextTransformerBlock(hidden_dim, num_heads, mlp_ratio)
            for _ in range(num_blocks)
        ]
        self.proj_out = Linear(hidden_dim, hidden_dim)
        self.norm_out = RMSNorm(hidden_dim)

    def init(self, key, dtype=jnp.float32):
        # reference init_weights (image_text.py:330-359): N(0, 0.02) linear
        # weights / zero biases / ones RMSNorm, ip_tokens ~ N(0,1)/sqrt(dim)
        from ....nn import flatten_params, unflatten_params

        keys = split_keys(key, ["tokens", "img", "txt", "out", "blocks"])
        bkeys = jax.random.split(keys["blocks"], max(len(self.blocks), 1))

        def reinit(params, k):
            out = {}
            for name, value in flatten_params(params).items():
                k = jax.random.fold_in(k, 1)
                if name.endswith("weight") and value.ndim == 2:
                    out[name] = jax.random.normal(k, value.shape, dtype) * 0.02
                elif name.endswith("bias"):
                    out[name] = jnp.zeros_like(value)
                else:  # RMSNorm weights
                    out[name] = jnp.ones_like(value)
            return unflatten_params(out)

        return {
            "ip_tokens": jax.random.normal(
                keys["tokens"], (1, self.num_ip_tokens, self.hidden_dim), dtype
            ) / self.hidden_dim**0.5,
            "image_proj_in": reinit(self.image_proj_in.init(keys["img"], dtype), keys["img"]),
            "text_proj_in": reinit(self.text_proj_in.init(keys["txt"], dtype), keys["txt"]),
            "blocks": {
                str(i): reinit(blk.init(k, dtype), k)
                for i, (blk, k) in enumerate(zip(self.blocks, bkeys))
            },
            "proj_out": reinit(self.proj_out.init(keys["out"], dtype), keys["out"]),
            "norm_out": self.norm_out.init(keys["out"], dtype),
        }

    @classmethod
    def config_from_pretrained(cls, state_dict, num_heads: int = 8) -> dict:
        # Derived from the module's actual key layout. (The reference's own
        # config_from_pretrained reads 'proj_in.weight' — image_text.py:367 —
        # a key its module never emits; we read the keys it does emit.)
        hidden_dim = state_dict["norm_out.weight"].shape[0]
        num_blocks = 0
        while f"blocks.{num_blocks}.attn1.to_q.weight" in state_dict:
            num_blocks += 1
        return dict(
            image_dim=state_dict["image_proj_in.weight"].shape[1],
            text_dim=state_dict["text_proj_in.weight"].shape[1],
            hidden_dim=hidden_dim,
            num_heads=num_heads,
            num_blocks=num_blocks,
            mlp_ratio=state_dict["blocks.0.mlp.0.weight"].shape[0] / hidden_dim,
            num_ip_tokens=state_dict["ip_tokens"].shape[1],
        )

    def __call__(self, params, image_features, text_features, *args, **kwargs):
        assert text_features is not None, (
            "image_text projector requires prompt embeddings"
        )
        b = image_features.shape[0]
        ip = jnp.broadcast_to(
            params["ip_tokens"], (b,) + params["ip_tokens"].shape[1:]
        ).astype(image_features.dtype)
        if text_features.shape[0] != b:
            # generate() encodes [positive_image, negative_image] against
            # cfg-doubled prompt embeddings; align batch by tiling/truncating
            text_features = jnp.resize(
                text_features, (b,) + text_features.shape[1:]
            )
        image_features = self.image_proj_in(params["image_proj_in"], image_features)
        text_features = self.text_proj_in(
            params["text_proj_in"], text_features.astype(image_features.dtype)
        )
        for i, block in enumerate(self.blocks):
            ip = block(params["blocks"][str(i)], image_features, text_features, ip)
        ip = self.proj_out(params["proj_out"], ip)
        return self.norm_out(params["norm_out"], ip)


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
    elif projector_type == "image_text":
        module = ImageTextProjector(
            **ImageTextProjector.config_from_pretrained(state_dict, **kwargs)
        )
    else:
        raise NotImplementedError(f"projector type {projector_type} not implemented")
    return module, unflatten_params(dict(state_dict))
