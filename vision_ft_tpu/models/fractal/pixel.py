"""Autoregressive guiding-pixel transformer (reference
src/models/fractal/pixel.py): a 4-token causal transformer
[condition, R, G, B] predicting 256-way logits per channel with weight
tying between the embedding and the head projection."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...nn import LayerNorm, Linear, Module, ModuleDict, split_keys
from ...ops.attention import scaled_dot_product_attention


class PixelHead(ModuleDict):
    """Tied embedding/classifier (reference PixelHead, pixel.py:143-161):
    encode() gathers rows of proj.weight; forward() applies proj.weight
    with the standalone ``bias`` parameter (proj.bias exists in the state
    dict but is unused by forward — quirk preserved)."""

    def __init__(self, vocab_size: int, hidden_dim: int):
        self.vocab_size = vocab_size
        super().__init__({"proj": Linear(hidden_dim, vocab_size)})

    def init(self, key, dtype=jnp.float32):
        params = super().init(key, dtype)
        params["bias"] = jnp.zeros((self.vocab_size,), dtype)
        return params

    def encode(self, params, pixel_values: jax.Array) -> jax.Array:
        return jnp.take(params["proj"]["weight"], pixel_values, axis=0)

    def __call__(self, params, hidden_states: jax.Array) -> jax.Array:
        return hidden_states @ params["proj"]["weight"].T + params["bias"]


class PixelTransformerBlock(ModuleDict):
    def __init__(self, hidden_dim: int, num_heads: int, mlp_ratio: float = 4.0,
                 backend: str = "xla"):
        self.num_heads = num_heads
        self.head_dim = hidden_dim // num_heads
        self.backend = backend
        inner = int(hidden_dim * mlp_ratio)
        super().__init__(
            {
                "norm1": LayerNorm(hidden_dim),
                "attn": ModuleDict(
                    {
                        "to_q": Linear(hidden_dim, hidden_dim, bias=True),
                        "to_k": Linear(hidden_dim, hidden_dim, bias=True),
                        "to_v": Linear(hidden_dim, hidden_dim, bias=True),
                        "to_o": Linear(hidden_dim, hidden_dim),
                    }
                ),
                "norm2": LayerNorm(hidden_dim),
                "mlp": ModuleDict(
                    {"fc1": Linear(hidden_dim, inner), "fc2": Linear(inner, hidden_dim)}
                ),
            }
        )

    def _attention(self, params, x):
        b, s, d = x.shape
        h, hd = self.num_heads, self.head_dim

        def heads(t):
            return t.reshape(b, s, h, hd).transpose(0, 2, 1, 3)

        a = params["attn"]
        q = heads(self["attn"]["to_q"](a["to_q"], x))
        k = heads(self["attn"]["to_k"](a["to_k"], x))
        v = heads(self["attn"]["to_v"](a["to_v"], x))
        attn = scaled_dot_product_attention(
            q, k, v, is_causal=True, backend=self.backend
        )
        attn = attn.transpose(0, 2, 1, 3).reshape(b, s, d)
        return self["attn"]["to_o"](a["to_o"], attn)

    def __call__(self, params, x):
        x = x + self._attention(params, self["norm1"](params["norm1"], x))
        h = self["norm2"](params["norm2"], x)
        h = self["mlp"]["fc1"](params["mlp"]["fc1"], h)
        h = jax.nn.gelu(h, approximate=False)
        h = self["mlp"]["fc2"](params["mlp"]["fc2"], h)
        return x + h


class PixelTransformerOutput(NamedTuple):
    logits: jax.Array  # (B, 3*256)
    labels: jax.Array  # (B, 3) int


class PixelTransformer(Module):
    """(reference PixelTransformer, pixel.py:168-234)."""

    def __init__(self, channels: int, hidden_dim: int, num_blocks: int,
                 num_heads: int, attention_backend: str = "xla"):
        self.condition_proj = Linear(channels, hidden_dim)
        self.red_head = PixelHead(256, hidden_dim)
        self.green_head = PixelHead(256, hidden_dim)
        self.blue_head = PixelHead(256, hidden_dim)
        self.pre_ln = LayerNorm(hidden_dim, eps=1e-6)
        self.blocks = [
            PixelTransformerBlock(hidden_dim, num_heads, backend=attention_backend)
            for _ in range(num_blocks)
        ]
        self.post_ln = LayerNorm(hidden_dim, eps=1e-6)

    def init(self, key, dtype=jnp.float32):
        names = ["cond", "red", "green", "blue", "pre", "post"] + [
            f"blocks.{i}" for i in range(len(self.blocks))
        ]
        keys = split_keys(key, names)
        return {
            "condition_proj": self.condition_proj.init(keys["cond"], dtype),
            "red_head": self.red_head.init(keys["red"], dtype),
            "green_head": self.green_head.init(keys["green"], dtype),
            "blue_head": self.blue_head.init(keys["blue"], dtype),
            "pre_ln": self.pre_ln.init(keys["pre"], dtype),
            "blocks": {
                str(i): blk.init(keys[f"blocks.{i}"], dtype)
                for i, blk in enumerate(self.blocks)
            },
            "post_ln": self.post_ln.init(keys["post"], dtype),
        }

    def __call__(
        self,
        params,
        key: jax.Array,
        guiding_condition: jax.Array,  # (B, S, D) — only token 0 is used
        ground_truth: jax.Array,  # (B, 3) in [0, 1]
    ) -> PixelTransformerOutput:
        # tiny dither before rounding avoids banker's-rounding pile-ups
        # (reference pixel.py:203-206)
        noise = 1e-2 * jax.random.normal(key, ground_truth.shape)
        labels = jnp.round(ground_truth * 255.0 + noise).astype(jnp.int32)

        condition = self.condition_proj(
            params["condition_proj"], guiding_condition[:, 0]
        )
        x = jnp.stack(
            [
                condition,
                self.red_head.encode(params["red_head"], labels[:, 0]),
                self.green_head.encode(params["green_head"], labels[:, 1]),
                self.blue_head.encode(params["blue_head"], labels[:, 2]),
            ],
            axis=1,
        )
        x = self.pre_ln(params["pre_ln"], x)
        for i, blk in enumerate(self.blocks):
            x = blk(params["blocks"][str(i)], x)
        x = self.post_ln(params["post_ln"], x)

        logits = jnp.concatenate(
            [
                self.red_head(params["red_head"], x[:, 0]),
                self.green_head(params["green_head"], x[:, 1]),
                self.blue_head(params["blue_head"], x[:, 2]),
            ],
            axis=1,
        )
        return PixelTransformerOutput(logits=logits, labels=labels)
