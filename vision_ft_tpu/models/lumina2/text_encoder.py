"""Lumina2 text encoder: native Gemma-2-2B penultimate hidden states.

Behavioral spec: /root/reference/src/models/lumina2/text_encoder.py —
hidden_states[-2] + attention masks, padding "longest" (we pad to
max_token_length for static jit shapes; extra positions are masked, which
the NextDiT holey layout handles exactly). Param tree = {"model": ...}
matching the ``text_encoder.model.*`` internal key prefix.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...nn import Module
from ..text_encoders.gemma2 import LUMINA2_GEMMA2_CONFIG, Gemma2Config, Gemma2Model
from ..utils import PromptType, TextEncodingOutput

DEFAULT_MAX_TOKEN_LENGTH = 256
TEXT_ENCODER_TENSOR_PREFIX = "text_encoders.gemma2_2b.transformer."


class TextEncoder(Module):
    def __init__(self, config: Optional[Gemma2Config] = None, tokenizer=None):
        self.model = Gemma2Model(config or LUMINA2_GEMMA2_CONFIG)
        self.tokenizer = tokenizer

    def init(self, key, dtype=jnp.float32):
        return {"model": self.model.init(key, dtype)}

    def _encode_tokens_impl(self, params, input_ids, attention_mask):
        _, penultimate = self.model(params["model"], input_ids, attention_mask)
        return penultimate

    def encode_tokens(self, params, input_ids: jax.Array, attention_mask: jax.Array):
        """Returns penultimate hidden states (B, S, hidden); jitted
        (nn.core.cached_jit)."""
        from ...nn.core import cached_jit

        return cached_jit(self, "encode_tokens", self._encode_tokens_impl)(
            params, input_ids, attention_mask
        )

    def normalize_prompts(
        self,
        prompts: PromptType,
        negative_prompts: Optional[PromptType] = None,
        use_negative_prompts: bool = True,
    ) -> tuple[list[str], list[str]]:
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

    def tokenize(self, prompts: list[str], max_token_length: int):
        if self.tokenizer is None:
            raise RuntimeError("No tokenizer configured for TextEncoder")
        out = self.tokenizer(
            prompts,
            max_length=max_token_length,
            padding="max_length",
            truncation=True,
        )
        return (
            np.asarray(out["input_ids"], np.int32),
            np.asarray(out["attention_mask"], np.int32),
        )

    def encode_prompts(
        self,
        params,
        prompts: PromptType,
        negative_prompts: Optional[PromptType] = None,
        use_negative_prompts: bool = False,
        max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH,
    ) -> TextEncodingOutput:
        _prompts, _negatives = self.normalize_prompts(
            prompts, negative_prompts, use_negative_prompts
        )
        n_pos = len(_prompts)
        ids, mask = self.tokenize(_prompts + _negatives, max_token_length)
        hidden = self.encode_tokens(params, jnp.asarray(ids), jnp.asarray(mask))
        mask = jnp.asarray(mask)
        return TextEncodingOutput(
            positive_embeddings=hidden[:n_pos],
            positive_attention_mask=mask[:n_pos],
            negative_embeddings=hidden[n_pos:],
            negative_attention_mask=mask[n_pos:],
        )
