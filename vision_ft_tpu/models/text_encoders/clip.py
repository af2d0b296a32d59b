"""CLIP text encoder — native JAX implementation (HF-transformers layout).

The reference uses HF `CLIPTextModel` / `CLIPTextModelWithProjection`
instantiated from hard-coded configs (no downloaded weights) as SDXL's
dual text encoders (/root/reference/src/models/sdxl/text_encoder.py:25-77).
This is a from-scratch JAX encoder whose param tree flattens to the exact
HF state-dict keys (``text_model.encoder.layers.N.self_attn.q_proj...``),
so sgm checkpoints load after the OpenCLIP->transformers key conversion.

TPU notes: one jit-able ``__call__`` over (B, S) int32 ids; causal mask is
an additive fp32 bias; attention runs through the shared dispatch so the
Pallas flash kernel applies here too.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Literal, Optional

import jax
import jax.numpy as jnp

from ...nn import Embedding, LayerNorm, Linear, Module, ModuleDict, split_keys
from ...ops.attention import AttentionImplementation, scaled_dot_product_attention


@dataclass
class CLIPTextConfig:
    """Subset of HF CLIPTextConfig the text tower needs."""

    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    max_position_embeddings: int = 77
    hidden_act: Literal["quick_gelu", "gelu"] = "quick_gelu"
    layer_norm_eps: float = 1e-5
    eos_token_id: int = 2
    projection_dim: int = 768
    attention_backend: AttentionImplementation = "xla"


# SDXL text encoder 1: OpenAI CLIP ViT-L/14 text tower
# (reference src/models/sdxl/text_encoder.py:25-48)
SDXL_TEXT_ENCODER_1_CONFIG = CLIPTextConfig(
    hidden_size=768,
    intermediate_size=3072,
    num_hidden_layers=12,
    num_attention_heads=12,
    hidden_act="quick_gelu",
    projection_dim=768,
)

# SDXL text encoder 2: OpenCLIP bigG text tower
# (reference src/models/sdxl/text_encoder.py:52-74)
SDXL_TEXT_ENCODER_2_CONFIG = CLIPTextConfig(
    hidden_size=1280,
    intermediate_size=5120,
    num_hidden_layers=32,
    num_attention_heads=20,
    hidden_act="gelu",
    projection_dim=1280,
)


def _act(name: str, x: jax.Array) -> jax.Array:
    if name == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    return jax.nn.gelu(x, approximate=False)


class CLIPAttention(ModuleDict):
    def __init__(self, config: CLIPTextConfig):
        d = config.hidden_size
        self.num_heads = config.num_attention_heads
        self.head_dim = d // config.num_attention_heads
        self.backend = config.attention_backend
        super().__init__(
            {
                "q_proj": Linear(d, d),
                "k_proj": Linear(d, d),
                "v_proj": Linear(d, d),
                "out_proj": Linear(d, d),
            }
        )

    def __call__(self, params, x, bias):
        b, s, d = x.shape
        h, hd = self.num_heads, self.head_dim

        def heads(t):
            return t.reshape(b, s, h, hd).transpose(0, 2, 1, 3)

        q = heads(self["q_proj"](params["q_proj"], x))
        k = heads(self["k_proj"](params["k_proj"], x))
        v = heads(self["v_proj"](params["v_proj"], x))
        attn = scaled_dot_product_attention(q, k, v, mask=bias, backend=self.backend)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, s, d)
        return self["out_proj"](params["out_proj"], attn)


class CLIPEncoderLayer(ModuleDict):
    def __init__(self, config: CLIPTextConfig):
        d = config.hidden_size
        self.hidden_act = config.hidden_act
        super().__init__(
            {
                "self_attn": CLIPAttention(config),
                "layer_norm1": LayerNorm(d, eps=config.layer_norm_eps),
                "mlp": ModuleDict(
                    {
                        "fc1": Linear(d, config.intermediate_size),
                        "fc2": Linear(config.intermediate_size, d),
                    }
                ),
                "layer_norm2": LayerNorm(d, eps=config.layer_norm_eps),
            }
        )

    def __call__(self, params, x, bias):
        x = x + self["self_attn"](
            params["self_attn"], self["layer_norm1"](params["layer_norm1"], x), bias
        )
        h = self["layer_norm2"](params["layer_norm2"], x)
        h = self["mlp"]["fc1"](params["mlp"]["fc1"], h)
        h = _act(self.hidden_act, h)
        h = self["mlp"]["fc2"](params["mlp"]["fc2"], h)
        return x + h


class CLIPTextModel(Module):
    """Text tower. ``__call__`` returns (last_hidden_state, penultimate
    hidden state, pooled) — the three tensors SDXL consumes; a full
    ``hidden_states`` list is deliberately not materialized.

    ``pooled`` follows HF semantics for eos_token_id==2 configs: take the
    position of the *highest* token id (the real eos, 49407) per row.
    """

    def __init__(self, config: CLIPTextConfig):
        self.config = config
        self.embeddings = ModuleDict(
            {
                "token_embedding": Embedding(config.vocab_size, config.hidden_size),
                "position_embedding": Embedding(
                    config.max_position_embeddings, config.hidden_size
                ),
            }
        )
        self.layers = ModuleDict(
            {str(i): CLIPEncoderLayer(config) for i in range(config.num_hidden_layers)}
        )
        self.final_layer_norm = LayerNorm(config.hidden_size, eps=config.layer_norm_eps)

    def init(self, key, dtype=jnp.float32):
        keys = split_keys(key, ["emb", "layers", "final"])
        return {
            "text_model": {
                "embeddings": self.embeddings.init(keys["emb"], dtype),
                "encoder": {"layers": self.layers.init(keys["layers"], dtype)},
                "final_layer_norm": self.final_layer_norm.init(keys["final"], dtype),
            }
        }

    def __call__(
        self,
        params,
        input_ids: jax.Array,
        style_embeddings: jax.Array = None,
        style_token_id: int = None,
    ):
        tm = params["text_model"]
        emb = tm["embeddings"]
        s = input_ids.shape[-1]
        x = self.embeddings["token_embedding"](emb["token_embedding"], input_ids)
        if style_embeddings is not None:
            # masked_scatter semantics (reference style_tokenizer adapter,
            # src/models/sdxl/adapter/style_tokenizer.py:82-111): the k-th
            # style-token position in flattened row-major order receives
            # the k-th style vector
            mask = input_ids == style_token_id
            flat_mask = mask.reshape(-1)
            source = style_embeddings.reshape(-1, x.shape[-1]).astype(x.dtype)
            idx = jnp.clip(jnp.cumsum(flat_mask) - 1, 0, source.shape[0] - 1)
            gathered = source[idx].reshape(*mask.shape, x.shape[-1])
            x = jnp.where(mask[..., None], gathered, x)
        positions = jnp.arange(s)
        x = x + self.embeddings["position_embedding"](emb["position_embedding"], positions)

        # additive causal bias (HF uses finfo.min; -inf risks NaN rows)
        neg = jnp.finfo(jnp.float32).min
        bias = jnp.triu(jnp.full((s, s), neg, dtype=jnp.float32), k=1)[None, None]

        layers = tm["encoder"]["layers"]
        penultimate = x
        for i in range(self.config.num_hidden_layers):
            if i == self.config.num_hidden_layers - 1:
                penultimate = x
            x = self.layers[str(i)](layers[str(i)], x, bias)

        last = self.final_layer_norm(tm["final_layer_norm"], x)

        # first real-eos position. HF's eos_token_id==2 path uses
        # argmax(input_ids) (highest id == real eos 49407); that breaks once
        # added tokens (e.g. <|style|>, id >= 49408) enter the vocab, so
        # match on the actual eos id (HF CLIP modeling, and the style
        # adapter's explicit ==eos argmax, reference
        # models/sdxl/adapter/style_tokenizer.py:336-349)
        eos_id = self.config.vocab_size - 1  # 49407 for CLIP vocabs
        eos_positions = jnp.argmax((input_ids == eos_id).astype(jnp.int32), axis=-1)
        pooled = jnp.take_along_axis(last, eos_positions[:, None, None], axis=1)[:, 0]
        return last, penultimate, pooled


class CLIPTextModelWithProjection(CLIPTextModel):
    """Adds the (bias-free) text_projection on the pooled embedding —
    HF CLIPTextModelWithProjection, used by SDXL's OpenCLIP-bigG tower."""

    def __init__(self, config: CLIPTextConfig):
        super().__init__(config)
        self.text_projection = Linear(config.hidden_size, config.projection_dim, bias=False)

    def init(self, key, dtype=jnp.float32):
        k1, k2 = jax.random.split(key)
        params = super().init(k1, dtype)
        params["text_projection"] = self.text_projection.init(k2, dtype)
        return params

    def __call__(
        self,
        params,
        input_ids: jax.Array,
        style_embeddings: jax.Array = None,
        style_token_id: int = None,
    ):
        last, penultimate, pooled = super().__call__(
            params, input_ids, style_embeddings, style_token_id
        )
        text_embeds = self.text_projection(params["text_projection"], pooled)
        return last, penultimate, text_embeds
