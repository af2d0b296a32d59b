"""Gemma-2 decoder-only LM (encoder use) — native JAX implementation.

Behavioral spec: HF transformers `Gemma2Model` as instantiated by the
reference for Lumina2's text tower
(/root/reference/src/models/lumina2/text_encoder.py:14-46):
- embeddings scaled by sqrt(hidden_size)
- Gemma RMSNorm with (1 + weight) scaling
- GQA with rotary embeddings, query scale = query_pre_attn_scalar^-0.5,
  attention-logit softcapping (50.0), causal masking
- sandwich norms: input/post_attention + pre/post_feedforward
- gelu_tanh gated MLP
- sliding-window attention on alternating layers (window 4096 — inert for
  the <=256-token prompts this framework encodes; implemented anyway)

Returns (final_normed, penultimate): the reference consumes
hidden_states[-2] (the last layer's output BEFORE the final norm).
Param keys flatten to the HF layout (embed_tokens.weight,
layers.N.self_attn.q_proj.weight, ...).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...nn import Embedding, Linear, Module, ModuleDict, split_keys
from ...ops.attention import scaled_dot_product_attention


@dataclasses.dataclass
class Gemma2Config:
    vocab_size: int = 256000
    hidden_size: int = 2304
    intermediate_size: int = 9216
    num_hidden_layers: int = 26
    num_attention_heads: int = 8
    num_key_value_heads: int = 4
    head_dim: int = 256
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    query_pre_attn_scalar: float = 256.0
    attn_logit_softcapping: Optional[float] = 50.0
    sliding_window: int = 4096
    attention_backend: str = "xla"


# Lumina2's Gemma-2-2B config (reference text_encoder.py:14-41)
LUMINA2_GEMMA2_CONFIG = Gemma2Config()


def _gemma_rms_norm(params, x: jax.Array, eps: float) -> jax.Array:
    dtype = x.dtype
    h = x.astype(jnp.float32)
    h = h * jax.lax.rsqrt(jnp.mean(jnp.square(h), axis=-1, keepdims=True) + eps)
    return (h * (1.0 + params["weight"].astype(jnp.float32))).astype(dtype)


def _rotary(x: jax.Array, theta: float) -> jax.Array:
    """HF-style rotary on (B, H, S, D): rotate_half formulation, fp32."""
    b, h, s, d = x.shape
    inv_freq = 1.0 / (theta ** (np.arange(0, d, 2, dtype=np.float64) / d))
    pos = np.arange(s, dtype=np.float64)
    angles = np.outer(pos, inv_freq)  # (S, D/2)
    cos = jnp.asarray(np.cos(angles), jnp.float32)
    sin = jnp.asarray(np.sin(angles), jnp.float32)
    cos = jnp.concatenate([cos, cos], axis=-1)  # (S, D)
    sin = jnp.concatenate([sin, sin], axis=-1)
    xf = x.astype(jnp.float32)
    x1, x2 = xf[..., : d // 2], xf[..., d // 2 :]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return (xf * cos + rotated * sin).astype(x.dtype)


class Gemma2Attention(ModuleDict):
    def __init__(self, config: Gemma2Config, layer_idx: int):
        self.config = config
        self.layer_idx = layer_idx
        # HF: sliding window on even layers (layer_idx % 2 == 0)
        self.is_sliding = layer_idx % 2 == 0
        h, kv, d = config.num_attention_heads, config.num_key_value_heads, config.head_dim
        super().__init__(
            {
                "q_proj": Linear(config.hidden_size, h * d, bias=False),
                "k_proj": Linear(config.hidden_size, kv * d, bias=False),
                "v_proj": Linear(config.hidden_size, kv * d, bias=False),
                "o_proj": Linear(h * d, config.hidden_size, bias=False),
            }
        )

    def __call__(self, params, x, attention_mask: Optional[jax.Array]):
        cfg = self.config
        b, s, _ = x.shape
        h, kv, d = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

        q = self["q_proj"](params["q_proj"], x).reshape(b, s, h, d).transpose(0, 2, 1, 3)
        k = self["k_proj"](params["k_proj"], x).reshape(b, s, kv, d).transpose(0, 2, 1, 3)
        v = self["v_proj"](params["v_proj"], x).reshape(b, s, kv, d).transpose(0, 2, 1, 3)

        q = _rotary(q, cfg.rope_theta)
        k = _rotary(k, cfg.rope_theta)

        rep = h // kv
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)

        scale = cfg.query_pre_attn_scalar**-0.5
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * scale
        if cfg.attn_logit_softcapping is not None:
            cap = cfg.attn_logit_softcapping
            logits = cap * jnp.tanh(logits / cap)

        causal = np.tril(np.ones((s, s), bool))
        if self.is_sliding and s > cfg.sliding_window:
            window = np.triu(np.ones((s, s), bool), -cfg.sliding_window + 1)
            causal = causal & window
        mask = jnp.asarray(causal)[None, None]
        if attention_mask is not None:
            mask = mask & attention_mask[:, None, None, :].astype(bool)
        logits = jnp.where(mask, logits, -1e30)

        weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        attn = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, s, h * d)
        return self["o_proj"](params["o_proj"], attn)


class Gemma2MLP(ModuleDict):
    def __init__(self, config: Gemma2Config):
        super().__init__(
            {
                "gate_proj": Linear(config.hidden_size, config.intermediate_size, bias=False),
                "up_proj": Linear(config.hidden_size, config.intermediate_size, bias=False),
                "down_proj": Linear(config.intermediate_size, config.hidden_size, bias=False),
            }
        )

    def __call__(self, params, x):
        gate = jax.nn.gelu(self["gate_proj"](params["gate_proj"], x), approximate=True)
        return self["down_proj"](params["down_proj"], gate * self["up_proj"](params["up_proj"], x))


class Gemma2Layer(ModuleDict):
    def __init__(self, config: Gemma2Config, layer_idx: int):
        self.eps = config.rms_norm_eps
        super().__init__(
            {
                "self_attn": Gemma2Attention(config, layer_idx),
                "mlp": Gemma2MLP(config),
                "input_layernorm": _NormParam(config.hidden_size),
                "post_attention_layernorm": _NormParam(config.hidden_size),
                "pre_feedforward_layernorm": _NormParam(config.hidden_size),
                "post_feedforward_layernorm": _NormParam(config.hidden_size),
            }
        )

    def __call__(self, params, x, attention_mask):
        residual = x
        h = _gemma_rms_norm(params["input_layernorm"], x, self.eps)
        h = self["self_attn"](params["self_attn"], h, attention_mask)
        h = _gemma_rms_norm(params["post_attention_layernorm"], h, self.eps)
        x = residual + h

        residual = x
        h = _gemma_rms_norm(params["pre_feedforward_layernorm"], x, self.eps)
        h = self["mlp"](params["mlp"], h)
        h = _gemma_rms_norm(params["post_feedforward_layernorm"], h, self.eps)
        return residual + h


class _NormParam(Module):
    def __init__(self, dim: int):
        self.dim = dim

    def init(self, key, dtype=jnp.float32):
        # Gemma stores weight as the *offset* from 1 -> zeros init
        return {"weight": jnp.zeros((self.dim,), dtype)}


class Gemma2Model(Module):
    def __init__(self, config: Gemma2Config):
        self.config = config
        self.embed_tokens = Embedding(config.vocab_size, config.hidden_size)
        self.layers = [Gemma2Layer(config, i) for i in range(config.num_hidden_layers)]
        self.norm = _NormParam(config.hidden_size)

    def init(self, key, dtype=jnp.float32):
        keys = split_keys(key, ["embed", "layers", "norm"])
        lkeys = jax.random.split(keys["layers"], len(self.layers))
        return {
            "embed_tokens": self.embed_tokens.init(keys["embed"], dtype),
            "layers": {
                str(i): layer.init(k, dtype)
                for i, (layer, k) in enumerate(zip(self.layers, lkeys))
            },
            "norm": self.norm.init(keys["norm"], dtype),
        }

    def __call__(
        self, params, input_ids: jax.Array, attention_mask: Optional[jax.Array] = None
    ) -> tuple[jax.Array, jax.Array]:
        """Returns (last_hidden_state [final-normed], penultimate).

        ``penultimate`` matches HF ``output_hidden_states[-2]``: the INPUT
        to the last decoder layer (HF appends each layer's input, then the
        final-normed output) — the reference consumes exactly this
        (src/models/lumina2/text_encoder.py:115-118).
        """
        x = self.embed_tokens(params["embed_tokens"], input_ids)
        x = x * jnp.asarray(math.sqrt(self.config.hidden_size), x.dtype)
        penultimate = x
        for i, layer in enumerate(self.layers):
            penultimate = x
            x = layer(params["layers"][str(i)], x, attention_mask)
        final = _gemma_rms_norm(params["norm"], x, self.config.rms_norm_eps)
        return final, penultimate
