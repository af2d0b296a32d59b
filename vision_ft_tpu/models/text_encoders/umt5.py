"""UMT5 encoder — native JAX implementation.

Behavioral spec: HF transformers `UMT5EncoderModel` as instantiated by the
reference for AuraFlow's Pile-T5-XL text tower
(/root/reference/src/models/auraflow/text_encoder.py:12-51): RMS layer
norms, gated-act FFN (gelu_new), NO 1/sqrt(d) attention scaling (T5
convention), and **per-layer** relative position bias (the UMT5 delta vs
T5's shared-first-layer bias). Param keys flatten to the HF state-dict
layout (shared.weight, encoder.block.N.layer.0.SelfAttention.q.weight...).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...nn import Embedding, Linear, Module, ModuleDict, RMSNorm, split_keys
from ...ops.attention import scaled_dot_product_attention


@dataclasses.dataclass
class UMT5Config:
    vocab_size: int = 32128
    d_model: int = 2048
    d_kv: int = 64
    d_ff: int = 5120
    num_layers: int = 24
    num_heads: int = 32
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    dense_act_fn: str = "gelu_new"
    attention_backend: str = "xla"
    # UMT5: every layer owns a relative bias; classic T5 (e.g. Flux's
    # T5-XXL): only block 0 owns it and all layers share it
    per_layer_relative_bias: bool = True


# AuraFlow's Pile-T5-XL config (reference text_encoder.py:19-47)
AURAFLOW_UMT5_CONFIG = UMT5Config()


def _act(name: str):
    return {
        "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
        "gelu": lambda x: jax.nn.gelu(x, approximate=False),
        "relu": jax.nn.relu,
        "silu": jax.nn.silu,
    }[name]


def relative_position_bucket(
    relative_position: np.ndarray, num_buckets: int = 32, max_distance: int = 128
) -> np.ndarray:
    """Bidirectional T5 bucket mapping (encoder case), static numpy."""
    num_buckets //= 2
    buckets = (relative_position > 0).astype(np.int64) * num_buckets
    rel = np.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = rel < max_exact
    safe_rel = np.maximum(rel, 1)  # log arg; values < max_exact are masked by is_small
    log_ratio = np.log(safe_rel.astype(np.float64) / max_exact) / math.log(
        max_distance / max_exact
    )
    large = max_exact + (log_ratio * (num_buckets - max_exact)).astype(np.int64)
    large = np.minimum(large, num_buckets - 1)
    return buckets + np.where(is_small, rel, large)


class UMT5Attention(ModuleDict):
    def __init__(self, config: UMT5Config, has_relative_bias: bool = True):
        self.config = config
        self.n_heads = config.num_heads
        self.d_kv = config.d_kv
        self.has_relative_bias = has_relative_bias
        inner = config.num_heads * config.d_kv
        children = {
            "q": Linear(config.d_model, inner, bias=False),
            "k": Linear(config.d_model, inner, bias=False),
            "v": Linear(config.d_model, inner, bias=False),
            "o": Linear(inner, config.d_model, bias=False),
        }
        if has_relative_bias:
            children["relative_attention_bias"] = Embedding(
                config.relative_attention_num_buckets, config.num_heads
            )
        super().__init__(children)

    def position_bias(self, params, seq_len: int) -> jax.Array:
        """(1, heads, seq, seq) additive bias; bucket table is static."""
        context = np.arange(seq_len)[:, None]
        memory = np.arange(seq_len)[None, :]
        buckets = relative_position_bucket(
            memory - context,
            self.config.relative_attention_num_buckets,
            self.config.relative_attention_max_distance,
        )
        values = self["relative_attention_bias"](
            params["relative_attention_bias"], jnp.asarray(buckets)
        )  # (seq, seq, heads)
        return values.transpose(2, 0, 1)[None]

    def __call__(self, params, x, mask: Optional[jax.Array] = None,
                 position_bias: Optional[jax.Array] = None):
        b, s, _ = x.shape
        h, d = self.n_heads, self.d_kv

        def heads(t):
            return t.reshape(b, s, h, d).transpose(0, 2, 1, 3)

        q = heads(self["q"](params["q"], x))
        k = heads(self["k"](params["k"], x))
        v = heads(self["v"](params["v"], x))
        bias = (
            position_bias if position_bias is not None else self.position_bias(params, s)
        ).astype(jnp.float32)
        if mask is not None:
            # additive: 0 keep, -inf drop (broadcast (B, 1, 1, S))
            bias = bias + jnp.where(mask[:, None, None, :], 0.0, -1e9)
        # T5: no 1/sqrt(d) scaling (folded into init)
        attn = scaled_dot_product_attention(q, k, v, mask=bias, scale=1.0)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, s, h * d)
        return self["o"](params["o"], attn)


class UMT5Block(ModuleDict):
    def __init__(self, config: UMT5Config, has_relative_bias: bool = True):
        self.act = _act(config.dense_act_fn)
        super().__init__(
            {
                "layer": ModuleDict(
                    {
                        "0": ModuleDict(
                            {
                                "SelfAttention": UMT5Attention(config, has_relative_bias),
                                "layer_norm": RMSNorm(config.d_model, config.layer_norm_epsilon),
                            }
                        ),
                        "1": ModuleDict(
                            {
                                "DenseReluDense": ModuleDict(
                                    {
                                        "wi_0": Linear(config.d_model, config.d_ff, bias=False),
                                        "wi_1": Linear(config.d_model, config.d_ff, bias=False),
                                        "wo": Linear(config.d_ff, config.d_model, bias=False),
                                    }
                                ),
                                "layer_norm": RMSNorm(config.d_model, config.layer_norm_epsilon),
                            }
                        ),
                    }
                )
            }
        )

    def __call__(self, params, x, mask=None, position_bias=None):
        l0 = self["layer"]["0"]
        p0 = params["layer"]["0"]
        normed = l0["layer_norm"](p0["layer_norm"], x)
        x = x + l0["SelfAttention"](p0["SelfAttention"], normed, mask, position_bias)

        l1 = self["layer"]["1"]
        p1 = params["layer"]["1"]
        normed = l1["layer_norm"](p1["layer_norm"], x)
        ff = l1["DenseReluDense"]
        pf = p1["DenseReluDense"]
        h = self.act(ff["wi_0"](pf["wi_0"], normed)) * ff["wi_1"](pf["wi_1"], normed)
        return x + ff["wo"](pf["wo"], h)


class UMT5EncoderModel(Module):
    """Param tree: shared.weight + encoder.{embed_tokens, block.N, final_layer_norm}."""

    def __init__(self, config: UMT5Config):
        self.config = config
        self.shared = Embedding(config.vocab_size, config.d_model)
        self.blocks = [
            UMT5Block(config, has_relative_bias=config.per_layer_relative_bias or i == 0)
            for i in range(config.num_layers)
        ]
        self.final_layer_norm = RMSNorm(config.d_model, config.layer_norm_epsilon)

    def init(self, key, dtype=jnp.float32):
        keys = split_keys(key, ["shared", "blocks", "final"])
        shared = self.shared.init(keys["shared"], dtype)
        bkeys = jax.random.split(keys["blocks"], len(self.blocks))
        return {
            "shared": shared,
            "encoder": {
                "embed_tokens": {"weight": shared["weight"]},
                "block": {
                    str(i): blk.init(k, dtype)
                    for i, (blk, k) in enumerate(zip(self.blocks, bkeys))
                },
                "final_layer_norm": self.final_layer_norm.init(keys["final"], dtype),
            },
        }

    def __call__(
        self, params, input_ids: jax.Array, attention_mask: Optional[jax.Array] = None
    ) -> jax.Array:
        """Returns last_hidden_state (B, S, d_model)."""
        embed = params["encoder"]["embed_tokens"]["weight"]
        x = jnp.take(embed, input_ids, axis=0)
        mask = attention_mask.astype(bool) if attention_mask is not None else None
        shared_bias = None
        if not self.config.per_layer_relative_bias:
            blk0 = self.blocks[0]["layer"]["0"]["SelfAttention"]
            shared_bias = blk0.position_bias(
                params["encoder"]["block"]["0"]["layer"]["0"]["SelfAttention"],
                x.shape[1],
            )
        for i, blk in enumerate(self.blocks):
            bias = shared_bias if (shared_bias is not None and i > 0) else None
            x = blk(params["encoder"]["block"][str(i)], x, mask, bias)
        return self.final_layer_norm(params["encoder"]["final_layer_norm"], x)
