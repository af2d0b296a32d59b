"""GLM-4 decoder LM (encoder use) — native JAX implementation.

Behavioral spec: HF transformers `GlmModel` as instantiated by the
reference for CogView4's text tower
(/root/reference/src/models/cogview4/text_encoder.py:15-44):
- partial rotary (rotary_dim = head_dim * partial_rotary_factor) with
  *interleaved* application on the rotary half, pass-through on the rest
- GQA (q/k/v_proj with bias, o_proj without), causal attention
- fused gate_up_proj SwiGLU MLP
- standard RMSNorm, pre-norm layers

Returns (final_normed, penultimate) like the Gemma2 module —
``penultimate`` is the input to the last decoder layer
(hidden_states[-2], reference text_encoder.py:134-136).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...nn import Embedding, Linear, Module, ModuleDict, RMSNorm, split_keys


@dataclasses.dataclass
class GlmConfig:
    vocab_size: int = 151552
    hidden_size: int = 4096
    intermediate_size: int = 13696
    num_hidden_layers: int = 40
    num_attention_heads: int = 32
    num_key_value_heads: int = 2
    head_dim: int = 128
    partial_rotary_factor: float = 0.5
    rope_theta: float = 10000.0
    rms_norm_eps: float = 1.5625e-07
    attention_bias: bool = True
    attention_backend: str = "xla"


COGVIEW4_GLM_CONFIG = GlmConfig()


def _glm_rotary(q: jax.Array, k: jax.Array, theta: float, rotary_dim: int):
    """Interleaved partial rotary (HF modeling_glm.apply_rotary_pos_emb)."""
    s = q.shape[2]
    half = rotary_dim // 2
    inv_freq = 1.0 / (theta ** (np.arange(0, rotary_dim, 2, dtype=np.float64) / rotary_dim))
    angles = np.outer(np.arange(s, dtype=np.float64), inv_freq)  # (S, half)
    cos = jnp.asarray(np.repeat(np.cos(angles), 2, axis=-1), jnp.float32)  # (S, rotary)
    sin = jnp.asarray(np.repeat(np.sin(angles), 2, axis=-1), jnp.float32)

    def apply(x):
        dtype = x.dtype
        xf = x.astype(jnp.float32)
        x_rot, x_pass = xf[..., :rotary_dim], xf[..., rotary_dim:]
        # GLM's rotate_half is the *interleaved* variant: pairs (2i, 2i+1)
        even = x_rot[..., 0::2]
        odd = x_rot[..., 1::2]
        rotated = jnp.stack([-odd, even], axis=-1).reshape(x_rot.shape)
        out = x_rot * cos + rotated * sin
        return jnp.concatenate([out, x_pass], axis=-1).astype(dtype)

    return apply(q), apply(k)


class GlmAttention(ModuleDict):
    def __init__(self, config: GlmConfig):
        self.config = config
        h, kv, d = config.num_attention_heads, config.num_key_value_heads, config.head_dim
        super().__init__(
            {
                "q_proj": Linear(config.hidden_size, h * d, bias=config.attention_bias),
                "k_proj": Linear(config.hidden_size, kv * d, bias=config.attention_bias),
                "v_proj": Linear(config.hidden_size, kv * d, bias=config.attention_bias),
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

        rotary_dim = int(d * cfg.partial_rotary_factor)
        q, k = _glm_rotary(q, k, cfg.rope_theta, rotary_dim)

        rep = h // kv
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)

        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        logits = logits * (d**-0.5)
        causal = jnp.asarray(np.tril(np.ones((s, s), bool)))[None, None]
        mask = causal
        if attention_mask is not None:
            mask = mask & attention_mask[:, None, None, :].astype(bool)
        logits = jnp.where(mask, logits, -1e30)
        weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        attn = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, s, h * d)
        return self["o_proj"](params["o_proj"], attn)


class GlmMLP(ModuleDict):
    def __init__(self, config: GlmConfig):
        super().__init__(
            {
                "gate_up_proj": Linear(config.hidden_size, 2 * config.intermediate_size, bias=False),
                "down_proj": Linear(config.intermediate_size, config.hidden_size, bias=False),
            }
        )

    def __call__(self, params, x):
        up_states = self["gate_up_proj"](params["gate_up_proj"], x)
        gate, up = jnp.split(up_states, 2, axis=-1)
        return self["down_proj"](params["down_proj"], up * jax.nn.silu(gate))


class GlmLayer(ModuleDict):
    def __init__(self, config: GlmConfig):
        super().__init__(
            {
                "self_attn": GlmAttention(config),
                "mlp": GlmMLP(config),
                "input_layernorm": RMSNorm(config.hidden_size, config.rms_norm_eps),
                "post_attention_layernorm": RMSNorm(config.hidden_size, config.rms_norm_eps),
            }
        )

    def __call__(self, params, x, attention_mask):
        h = self["input_layernorm"](params["input_layernorm"], x)
        x = x + self["self_attn"](params["self_attn"], h, attention_mask)
        h = self["post_attention_layernorm"](params["post_attention_layernorm"], x)
        return x + self["mlp"](params["mlp"], h)


class GlmModel(Module):
    def __init__(self, config: GlmConfig):
        self.config = config
        self.embed_tokens = Embedding(config.vocab_size, config.hidden_size)
        self.layers = [GlmLayer(config) for _ in range(config.num_hidden_layers)]
        self.norm = RMSNorm(config.hidden_size, config.rms_norm_eps)

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

    def __call__(self, params, input_ids, attention_mask=None):
        """Returns (last_hidden_state [final-normed], penultimate)."""
        x = self.embed_tokens(params["embed_tokens"], input_ids)
        penultimate = x
        for i, layer in enumerate(self.layers):
            penultimate = x
            x = layer(params["layers"][str(i)], x, attention_mask)
        return self.norm(params["norm"], x), penultimate
