"""CogView4 text encoder: native GLM-4 penultimate hidden states.

Behavioral spec: /root/reference/src/models/cogview4/text_encoder.py —
"longest" padding then LEFT-pad to a multiple of 16 with pad tokens,
penultimate hidden state, all-ones masks in the output (the reference
returns ones_like(input_ids) — attention inside runs unmasked). Param
tree = {"model": ...} matching the ``text_encoder.model.*`` internal keys.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...nn import Module
from ..text_encoders.glm import COGVIEW4_GLM_CONFIG, GlmConfig, GlmModel
from ..utils import PromptType, TextEncodingOutput

DEFAULT_MAX_TOKEN_LENGTH = 1024
TEXT_ENCODER_TENSOR_PREFIX = "text_encoder."


class TextEncoder(Module):
    def __init__(self, config: Optional[GlmConfig] = None, tokenizer=None):
        self.model = GlmModel(config or COGVIEW4_GLM_CONFIG)
        self.tokenizer = tokenizer

    def init(self, key, dtype=jnp.float32):
        return {"model": self.model.init(key, dtype)}

    def _encode_tokens_impl(self, params, input_ids):
        _, penultimate = self.model(params["model"], input_ids, None)
        return penultimate

    def encode_tokens(self, params, input_ids: jax.Array) -> jax.Array:
        from ...nn.core import cached_jit

        return cached_jit(self, "encode_tokens", self._encode_tokens_impl)(
            params, input_ids
        )

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
            _prompts + _negatives, max_length=max_token_length,
            padding="longest", truncation=True,
        )
        ids = np.asarray(out["input_ids"], np.int32)
        # left-pad to a multiple of 16 (reference text_encoder.py:118-133)
        pad_length = 16 - (ids.shape[1] % 16)
        if pad_length < 16:
            pad_id = getattr(self.tokenizer, "pad_token_id", 0) or 0
            ids = np.concatenate(
                [np.full((ids.shape[0], pad_length), pad_id, np.int32), ids], axis=1
            )
        hidden = self.encode_tokens(params, jnp.asarray(ids))
        ones = jnp.ones(ids.shape, jnp.int32)
        return TextEncodingOutput(
            positive_embeddings=hidden[:n_pos],
            positive_attention_mask=ones[:n_pos],
            negative_embeddings=hidden[n_pos:],
            negative_attention_mask=ones[n_pos:],
        )
