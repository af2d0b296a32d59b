"""AuraFlow text encoder: native UMT5 (Pile-T5-XL) + prompt API.

Behavioral spec: /root/reference/src/models/auraflow/text_encoder.py —
last_hidden_state multiplied by the attention mask (masked positions
zeroed), positive/negative split, max 256 tokens. The HF model lives
under a ``model.`` sub-prefix in the reference's module tree; the param
tree mirrors that ({"model": umt5_params}) so state-dict keys match
``text_encoders.pile_t5xl.transformer.*`` after prefix conversion.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...nn import Module
from ..text_encoders.umt5 import AURAFLOW_UMT5_CONFIG, UMT5Config, UMT5EncoderModel
from ..utils import PromptType, TextEncodingOutput

DEFAULT_MAX_TOKEN_LENGTH = 256
TEXT_ENCODER_TENSOR_PREFIX = "text_encoders.pile_t5xl.transformer."


class TextEncoder(Module):
    def __init__(self, config: Optional[UMT5Config] = None, tokenizer=None):
        self.model = UMT5EncoderModel(config or AURAFLOW_UMT5_CONFIG)
        self.tokenizer = tokenizer

    def init(self, key, dtype=jnp.float32):
        return {"model": self.model.init(key, dtype)}

    # -- jittable core ---------------------------------------------------------

    def _encode_tokens_impl(self, params, input_ids, attention_mask):
        hidden = self.model(params["model"], input_ids, attention_mask)
        mask = attention_mask[..., None].astype(hidden.dtype)
        return hidden * mask, attention_mask

    def encode_tokens(self, params, input_ids: jax.Array, attention_mask: jax.Array):
        # one jit per stage: eager tower dispatch through the axon tunnel
        # is pathologically slow (nn.core.cached_jit)
        from ...nn.core import cached_jit

        return cached_jit(self, "encode_tokens", self._encode_tokens_impl)(
            params, input_ids, attention_mask
        )

    # -- host-side prompt API ----------------------------------------------------

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
        """tokenizer must return dict with input_ids + attention_mask
        (HF-tokenizer compatible call signature)."""
        if self.tokenizer is None:
            raise RuntimeError("No tokenizer configured for TextEncoder")
        out = self.tokenizer(
            prompts,
            max_length=max_token_length,
            padding="max_length",
            truncation=True,
        )
        ids = np.asarray(out["input_ids"], np.int32)
        mask = np.asarray(out["attention_mask"], np.int32)
        return ids, mask

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
        hidden, attn = self.encode_tokens(params, jnp.asarray(ids), jnp.asarray(mask))
        mask_expanded = jnp.broadcast_to(attn[..., None], hidden.shape)
        return TextEncodingOutput(
            positive_embeddings=hidden[:n_pos],
            positive_attention_mask=mask_expanded[:n_pos],
            negative_embeddings=hidden[n_pos:],
            negative_attention_mask=mask_expanded[n_pos:],
        )
