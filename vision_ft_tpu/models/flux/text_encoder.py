"""Flux text encoder: native CLIP-L (pooled) + T5-XXL (hidden states).

Behavioral spec: /root/reference/src/models/flux/text_encoder.py — CLIP
pooler_output (vec conditioning) and masked T5 last_hidden_state (context),
positive/negative split; shared-weight tying and text_projection dropping
handled at load (pipeline). T5-XXL uses the classic shared-first-layer
relative bias (per_layer_relative_bias=False).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...nn import Module, split_keys
from ..text_encoders import CLIPTextModel
from ..text_encoders.clip import CLIPTextConfig
from ..text_encoders.umt5 import UMT5Config, UMT5EncoderModel
from ..utils import PooledTextEncodingOutput, PromptType, TextEncodingOutput

TEXT_ENCODER_CLIP_TENSOR_PREFIX = "text_encoders.clip_l.transformer."
TEXT_ENCODER_T5_TENSOR_PREFIX = "text_encoders.t5xxl.transformer."
DEFAULT_CLIP_MAX_TOKEN_LENGTH = 77
DEFAULT_T5_MAX_TOKEN_LENGTH = 512

# CLIP-L (reference flux/text_encoder.py:22-41) — same tower as SDXL's te1
FLUX_CLIP_CONFIG = CLIPTextConfig()

# T5-XXL (reference flux/text_encoder.py:50-76)
FLUX_T5_CONFIG = UMT5Config(
    vocab_size=32128,
    d_model=4096,
    d_kv=64,
    d_ff=10240,
    num_layers=24,
    num_heads=64,
    dense_act_fn="gelu_new",
    per_layer_relative_bias=False,  # classic T5
)


class MultipleTextEncodingOutput(NamedTuple):
    clip: PooledTextEncodingOutput
    t5: TextEncodingOutput


class TextEncoder(Module):
    def __init__(self, clip_config=None, t5_config=None,
                 clip_tokenizer=None, t5_tokenizer=None):
        self.clip = CLIPTextModel(clip_config or FLUX_CLIP_CONFIG)
        self.t5 = UMT5EncoderModel(t5_config or FLUX_T5_CONFIG)
        self.clip_tokenizer = clip_tokenizer
        self.t5_tokenizer = t5_tokenizer

    def init(self, key, dtype=jnp.float32):
        keys = split_keys(key, ["clip", "t5"])
        return {
            "clip": self.clip.init(keys["clip"], dtype),
            "t5": self.t5.init(keys["t5"], dtype),
        }

    # -- jittable cores -----------------------------------------------------------

    def encode_tokens_clip(self, params, input_ids: jax.Array) -> jax.Array:
        from ...nn.core import cached_jit

        def impl(p, ids):
            _, _, pooled = self.clip(p["clip"], ids)
            return pooled

        return cached_jit(self, "encode_tokens_clip", impl)(params, input_ids)

    def encode_tokens_t5(self, params, input_ids: jax.Array, attention_mask: jax.Array):
        from ...nn.core import cached_jit

        def impl(p, ids, m):
            hidden = self.t5(p["t5"], ids, m)
            return hidden * m[..., None].astype(hidden.dtype)

        return cached_jit(self, "encode_tokens_t5", impl)(params, input_ids, attention_mask)

    # -- host prompt API ---------------------------------------------------------------

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
        clip_max_token_length: int = DEFAULT_CLIP_MAX_TOKEN_LENGTH,
        t5_max_token_length: int = DEFAULT_T5_MAX_TOKEN_LENGTH,
    ) -> MultipleTextEncodingOutput:
        if self.clip_tokenizer is None or self.t5_tokenizer is None:
            raise RuntimeError("No tokenizers configured for TextEncoder")
        _prompts, _negatives = self.normalize_prompts(
            prompts, negative_prompts, use_negative_prompts
        )
        n_pos = len(_prompts)
        all_prompts = _prompts + _negatives

        clip_ids = np.asarray(
            self.clip_tokenizer(all_prompts, max_length=clip_max_token_length), np.int32
        )
        pooled = self.encode_tokens_clip(params, jnp.asarray(clip_ids))

        t5_out = self.t5_tokenizer(
            all_prompts, max_length=t5_max_token_length,
            padding="max_length", truncation=True,
        )
        t5_ids = jnp.asarray(np.asarray(t5_out["input_ids"], np.int32))
        t5_mask = jnp.asarray(np.asarray(t5_out["attention_mask"], np.int32))
        hidden = self.encode_tokens_t5(params, t5_ids, t5_mask)
        mask_expanded = jnp.broadcast_to(t5_mask[..., None], hidden.shape)

        clip_out = PooledTextEncodingOutput(
            positive_embeddings=pooled[:n_pos],
            pooled_positive_embeddings=pooled[:n_pos],
            negative_embeddings=pooled[n_pos:],
            pooled_negative_embeddings=pooled[n_pos:],
        )
        t5_enc = TextEncodingOutput(
            positive_embeddings=hidden[:n_pos],
            positive_attention_mask=mask_expanded[:n_pos],
            negative_embeddings=hidden[n_pos:],
            negative_attention_mask=mask_expanded[n_pos:],
        )
        return MultipleTextEncodingOutput(clip=clip_out, t5=t5_enc)
