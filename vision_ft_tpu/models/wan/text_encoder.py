"""Wan 2.2 text encoder — Alibaba's UMT5-variant encoder, native JAX.

Behavioral spec: /root/reference/src/models/wan/text_encoder.py (423 LoC):
a T5-style encoder with per-block relative position bias
(``shared_pos=False`` — every block owns a ``pos_embedding.embedding``),
TRUE mean-subtracting FP32 LayerNorm without bias (NOT T5's RMS norm,
text_encoder.py:183-186 uses FP32LayerNorm), unscaled attention logits
(text_encoder.py:124 — "T5 does not use scaling"), and a gated FFN
``fc2(fc1(x) * gelu(gate(x)))`` with exact (erf) GELU.

Defaults match Wan-AI/Wan2.2-TI2V-5B: vocab 256384, dim 4096,
dim_ffn 10240, 64 heads, 24 layers, 32 buckets.

State-dict keys (under the pipeline's ``model.`` prefix, util.py):
token_embedding.weight, blocks.N.{norm1,norm2}.weight,
blocks.N.attn.{q,k,v,o}.weight, blocks.N.ffn.{gate.0,fc1,fc2}.weight,
blocks.N.pos_embedding.embedding.weight, norm.weight.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from pydantic import BaseModel

from ...nn import Embedding, LayerNorm, Linear, Module, ModuleDict, split_keys
from ..utils import PromptType, TextEncodingOutput

DEFAULT_MAX_TOKEN_LENGTH = 512
DEFAULT_TOKENIZER_REPO = "Wan-AI/Wan2.2-TI2V-5B-Diffusers"
DEFAULT_TOKENIZER_FOLDER = "tokenizer"


class TextEncoderConfig(BaseModel):
    vocab_size: int = 256384
    dim: int = 4096
    dim_attn: int = 4096
    dim_ffn: int = 10240
    num_heads: int = 64
    num_layers: int = 24
    num_buckets: int = 32
    shared_pos: bool = False
    dropout: float = 0.1  # inference path: inert


def _relative_position_bucket(
    rel_pos: np.ndarray, num_buckets: int, max_dist: int = 128
) -> np.ndarray:
    """Bidirectional T5 bucket (reference text_encoder.py:229-254),
    computed host-side: the (Lq, Lk) bucket table is static per length."""
    half = num_buckets // 2
    rel_buckets = (rel_pos > 0).astype(np.int64) * half
    rel_pos = np.abs(rel_pos)
    max_exact = half // 2
    rel_pos_large = max_exact + (
        np.log(np.maximum(rel_pos, 1).astype(np.float32) / max_exact)
        / math.log(max_dist / max_exact)
        * (half - max_exact)
    ).astype(np.int64)
    rel_pos_large = np.minimum(rel_pos_large, half - 1)
    rel_buckets += np.where(rel_pos < max_exact, rel_pos, rel_pos_large)
    return rel_buckets


class T5RelativeEmbedding(ModuleDict):
    def __init__(self, num_buckets: int, num_heads: int):
        self.num_buckets = num_buckets
        super().__init__({"embedding": Embedding(num_buckets, num_heads)})

    def __call__(self, params, lq: int, lk: int) -> jax.Array:
        rel_pos = np.arange(lk)[None, :] - np.arange(lq)[:, None]
        buckets = jnp.asarray(
            _relative_position_bucket(rel_pos, self.num_buckets), jnp.int32
        )
        bias = self["embedding"](params["embedding"], buckets)  # (Lq, Lk, H)
        return bias.transpose(2, 0, 1)[None]  # (1, H, Lq, Lk)


class T5Attention(ModuleDict):
    """Unscaled multi-head attention with additive position bias
    (reference text_encoder.py:75-133)."""

    def __init__(self, dim: int, dim_attn: int, num_heads: int):
        self.num_heads = num_heads
        self.head_dim = dim_attn // num_heads
        super().__init__(
            {
                "q": Linear(dim, dim_attn, bias=False),
                "k": Linear(dim, dim_attn, bias=False),
                "v": Linear(dim, dim_attn, bias=False),
                "o": Linear(dim_attn, dim, bias=False),
            }
        )

    def __call__(self, params, x, mask=None, pos_bias=None):
        b, s, _ = x.shape
        n, c = self.num_heads, self.head_dim
        q = self["q"](params["q"], x).reshape(b, s, n, c)
        k = self["k"](params["k"], x).reshape(b, s, n, c)
        v = self["v"](params["v"], x).reshape(b, s, n, c)

        logits = jnp.einsum(
            "binc,bjnc->bnij", q, k, preferred_element_type=jnp.float32
        )
        if pos_bias is not None:
            logits = logits + pos_bias.astype(jnp.float32)
        if mask is not None:
            logits = jnp.where(
                mask[:, None, None, :].astype(bool), logits, jnp.finfo(jnp.float32).min
            )
        weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bnij,bjnc->binc", weights, v).reshape(b, s, n * c)
        return self["o"](params["o"], out)


class T5FeedForward(ModuleDict):
    """fc2(fc1(x) * gelu(gate(x))) with exact GELU (reference :136-159)."""

    def __init__(self, dim: int, dim_ffn: int):
        super().__init__(
            {
                "gate": ModuleDict({"0": Linear(dim, dim_ffn, bias=False)}),
                "fc1": Linear(dim, dim_ffn, bias=False),
                "fc2": Linear(dim_ffn, dim, bias=False),
            }
        )

    def __call__(self, params, x):
        gate = jax.nn.gelu(
            self["gate"]["0"](params["gate"]["0"], x), approximate=False
        )
        h = self["fc1"](params["fc1"], x) * gate
        return self["fc2"](params["fc2"], h)


class T5Block(ModuleDict):
    def __init__(self, config: TextEncoderConfig):
        children: dict[str, Module] = {
            "norm1": LayerNorm(config.dim, bias=False),
            "attn": T5Attention(config.dim, config.dim_attn, config.num_heads),
            "norm2": LayerNorm(config.dim, bias=False),
            "ffn": T5FeedForward(config.dim, config.dim_ffn),
        }
        if not config.shared_pos:
            children["pos_embedding"] = T5RelativeEmbedding(
                config.num_buckets, config.num_heads
            )
        super().__init__(children)
        self.shared_pos = config.shared_pos

    def __call__(self, params, x, mask=None, pos_bias=None):
        if not self.shared_pos:
            pos_bias = self["pos_embedding"](
                params["pos_embedding"], x.shape[1], x.shape[1]
            )
        x = x + self["attn"](params["attn"], self["norm1"](params["norm1"], x),
                             mask=mask, pos_bias=pos_bias)
        x = x + self["ffn"](params["ffn"], self["norm2"](params["norm2"], x))
        return x


class T5Encoder(Module):
    """(reference T5Encoder, text_encoder.py:257-326)."""

    def __init__(self, config: TextEncoderConfig):
        self.config = config
        self.token_embedding = Embedding(config.vocab_size, config.dim)
        self.shared_pos = (
            T5RelativeEmbedding(config.num_buckets, config.num_heads)
            if config.shared_pos
            else None
        )
        self.blocks = [T5Block(config) for _ in range(config.num_layers)]
        self.norm = LayerNorm(config.dim, bias=False)

    def init(self, key, dtype=jnp.float32):
        names = ["token_embedding", "norm"] + [
            f"blocks.{i}" for i in range(len(self.blocks))
        ]
        if self.shared_pos is not None:
            names.append("pos_embedding")
        keys = split_keys(key, names)
        params = {
            "token_embedding": self.token_embedding.init(keys["token_embedding"], dtype),
            "blocks": {
                str(i): blk.init(keys[f"blocks.{i}"], dtype)
                for i, blk in enumerate(self.blocks)
            },
            "norm": self.norm.init(keys["norm"], dtype),
        }
        if self.shared_pos is not None:
            params["pos_embedding"] = self.shared_pos.init(keys["pos_embedding"], dtype)
        return params

    def __call__(
        self, params, input_ids: jax.Array, attention_mask: Optional[jax.Array] = None
    ) -> jax.Array:
        x = self.token_embedding(params["token_embedding"], input_ids)
        pos_bias = (
            self.shared_pos(params["pos_embedding"], x.shape[1], x.shape[1])
            if self.shared_pos is not None
            else None
        )
        for i, blk in enumerate(self.blocks):
            x = blk(params["blocks"][str(i)], x, mask=attention_mask, pos_bias=pos_bias)
        return self.norm(params["norm"], x)


class TextEncoder(Module):
    """Tokenizer + encoder wrapper; param tree under ``model.`` matching the
    reference's internal keys (text_encoder.py:329-423, util.py:12-16)."""

    def __init__(
        self, config: Optional[TextEncoderConfig] = None, tokenizer=None
    ):
        self.model = T5Encoder(config or TextEncoderConfig())
        self.tokenizer = tokenizer

    def init(self, key, dtype=jnp.float32):
        return {"model": self.model.init(key, dtype)}

    def encode_tokens(self, params, input_ids, attention_mask=None):
        from ...nn.core import cached_jit

        return cached_jit(
            self, "encode_tokens",
            lambda p, ids, m: self.model(p["model"], ids, m),
        )(params, input_ids, attention_mask)

    def normalize_prompts(self, prompts, negative_prompts=None, use_negative_prompts=True):
        _prompts = list(prompts) if isinstance(prompts, (list, tuple)) else [prompts]
        if use_negative_prompts:
            if negative_prompts is not None:
                _negatives = (
                    list(negative_prompts)
                    if isinstance(negative_prompts, (list, tuple))
                    else [negative_prompts]
                )
                if len(_negatives) == 1 and len(_prompts) > 1:
                    _negatives = _negatives * len(_prompts)
            else:
                _negatives = [""] * len(_prompts)
        else:
            _negatives = []
        return _prompts, _negatives

    def encode_prompts(
        self,
        params,
        prompts: PromptType,
        negative_prompts: Optional[PromptType] = None,
        use_negative_prompts: bool = False,
        max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH,
    ) -> TextEncodingOutput:
        if self.tokenizer is None:
            raise RuntimeError("No tokenizer configured for TextEncoder")
        _prompts, _negatives = self.normalize_prompts(
            prompts, negative_prompts, use_negative_prompts
        )
        n_pos = len(_prompts)
        out = self.tokenizer(
            _prompts + _negatives,
            max_length=max_token_length,
            padding="longest",
            truncation=True,
            add_special_tokens=True,
        )
        ids = np.asarray(out["input_ids"], np.int32)
        if "attention_mask" in out:
            mask = np.asarray(out["attention_mask"], np.int32)
        else:
            pad_id = getattr(self.tokenizer, "pad_token_id", 0) or 0
            mask = (ids != pad_id).astype(np.int32)
        hidden = self.encode_tokens(params, jnp.asarray(ids), jnp.asarray(mask))
        mask = jnp.asarray(mask)
        return TextEncodingOutput(
            positive_embeddings=hidden[:n_pos],
            positive_attention_mask=mask[:n_pos],
            negative_embeddings=hidden[n_pos:],
            negative_attention_mask=mask[n_pos:],
        )
