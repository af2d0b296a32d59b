"""SDXL dual CLIP text encoder (TPU-native).

Behavioral spec: /root/reference/src/models/sdxl/text_encoder.py —
CLIP-L penultimate hidden states + OpenCLIP-bigG penultimate hidden
states and projected pooled embedding, with long prompts chunked to
75-token windows and chunk-concatenated (bos/eos re-insertion).

Split of responsibilities (jit boundary):
- ``encode_tokens(params, ids1, ids2, num_chunks)`` is pure/jittable —
  the hot path a compiled generate/train step calls.
- ``encode_prompts(...)`` is the host-side convenience doing string
  normalization, `!`-escaping, tokenization, and positive/negative
  splitting (reference text_encoder.py:155-387).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ...modules.long_prompt import tokenize_long_prompt
from ...nn import Module, split_keys
from ...ops.attention import AttentionImplementation
from ..text_encoders import CLIPTextModel, CLIPTextModelWithProjection
from ..text_encoders.clip import (
    SDXL_TEXT_ENCODER_1_CONFIG,
    SDXL_TEXT_ENCODER_2_CONFIG,
)
from ..utils import PooledTextEncodingOutput, PromptType, TextEncodingOutput

CHUNK_LENGTH = 75  # CLIP window minus bos/eos


class MultipleTextEncodingOutput(NamedTuple):
    text_encoder_1: TextEncodingOutput
    text_encoder_2: PooledTextEncodingOutput


def _merge_chunks(hidden: jax.Array, batch: int) -> jax.Array:
    """(batch*num_chunks, 77, d) -> (batch, 75*num_chunks + 2, d):
    drop inner bos/eos, keep the first bos and the last eos
    (reference text_encoder.py:216-243)."""
    bn, seq, d = hidden.shape
    h = hidden.reshape(batch, -1, seq, d)
    inner = h[:, :, 1:-1, :].reshape(batch, -1, d)
    first_bos = h[:, 0, :1, :]
    last_eos = h[:, -1, -1:, :]
    return jnp.concatenate([first_bos, inner, last_eos], axis=1)


def _merge_mask_chunks(mask: jax.Array, batch: int) -> jax.Array:
    bn, seq = mask.shape
    m = mask.reshape(batch, -1, seq)
    inner = m[:, :, 1:-1].reshape(batch, -1)
    return jnp.concatenate([m[:, 0, :1], inner, m[:, -1, -1:]], axis=1)


class TextEncoder(Module):
    """Holds both towers; param tree = {"text_encoder_1": ..., "text_encoder_2": ...}."""

    def __init__(
        self,
        backend: AttentionImplementation = "xla",
        tokenizer=None,
        config_1=None,
        config_2=None,
    ):
        import dataclasses

        cfg1 = dataclasses.replace(
            config_1 or SDXL_TEXT_ENCODER_1_CONFIG, attention_backend=backend
        )
        cfg2 = dataclasses.replace(
            config_2 or SDXL_TEXT_ENCODER_2_CONFIG, attention_backend=backend
        )
        self.text_encoder_1 = CLIPTextModel(cfg1)
        self.text_encoder_2 = CLIPTextModelWithProjection(cfg2)
        # one shared CLIP tokenizer (reference loads two identical copies)
        self.tokenizer = tokenizer

    def init(self, key, dtype=jnp.float32):
        keys = split_keys(key, ["te1", "te2"])
        return {
            "text_encoder_1": self.text_encoder_1.init(keys["te1"], dtype),
            "text_encoder_2": self.text_encoder_2.init(keys["te2"], dtype),
        }

    # -- jittable core -------------------------------------------------------

    def _encode_tokens_impl(self, batch, params, input_ids_1, input_ids_2):
        _, penult_1, _ = self.text_encoder_1(params["text_encoder_1"], input_ids_1)
        _, penult_2, text_embeds = self.text_encoder_2(
            params["text_encoder_2"], input_ids_2
        )
        emb1 = _merge_chunks(penult_1, batch)
        emb2 = _merge_chunks(penult_2, batch)
        # pooled: first chunk only (reference text_encoder.py:336-345)
        pooled = text_embeds.reshape(batch, -1, text_embeds.shape[-1])[:, 0]
        return emb1, emb2, pooled

    def encode_tokens(
        self,
        params,
        input_ids_1: jax.Array,
        input_ids_2: jax.Array,
        batch: int,
    ):
        """ids: (batch*num_chunks, 77). Returns (emb1, emb2, pooled2) with
        emb* already chunk-merged to (batch, 75*num_chunks+2, d). Runs
        under one jit — eager dual-CLIP dispatch measured 48 s through
        the axon tunnel (nn.core.cached_jit)."""
        from ...nn.core import cached_jit

        fn = cached_jit(
            self, "encode_tokens", self._encode_tokens_impl, static_argnums=0
        )
        return fn(batch, params, input_ids_1, input_ids_2)

    # -- host-side prompt API --------------------------------------------------

    @staticmethod
    def escape_exclamation(text: str) -> str:
        return text.replace("!", " !")

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
        return (
            [self.escape_exclamation(p) for p in _prompts],
            [self.escape_exclamation(p) for p in _negatives],
        )

    def encode_prompts(
        self,
        params,
        prompts: PromptType,
        negative_prompts: Optional[PromptType] = None,
        use_negative_prompts: bool = False,
        max_token_length: int = CHUNK_LENGTH,
    ) -> MultipleTextEncodingOutput:
        if self.tokenizer is None:
            raise RuntimeError(
                "No tokenizer configured. Pass tokenizer= to TextEncoder (e.g. "
                "CLIPTokenizer.from_pretrained_dir(path)) or call encode_tokens "
                "with pre-tokenized ids."
            )
        _prompts, _negatives = self.normalize_prompts(
            prompts, negative_prompts, use_negative_prompts
        )
        num_positive = len(_prompts)
        all_prompts = _prompts + _negatives
        batch = len(all_prompts)

        ids, mask = tokenize_long_prompt(
            self.tokenizer, all_prompts, max_length=max_token_length, chunk_length=CHUNK_LENGTH
        )
        ids = jnp.asarray(ids)

        emb1, emb2, pooled = self.encode_tokens(params, ids, ids, batch)
        merged_mask = _merge_mask_chunks(jnp.asarray(mask), batch)

        out1 = TextEncodingOutput(
            positive_embeddings=emb1[:num_positive],
            positive_attention_mask=merged_mask[:num_positive],
            negative_embeddings=emb1[num_positive:],
            negative_attention_mask=merged_mask[num_positive:],
        )
        out2 = PooledTextEncodingOutput(
            positive_embeddings=emb2[:num_positive],
            pooled_positive_embeddings=pooled[:num_positive],
            negative_embeddings=emb2[num_positive:],
            pooled_negative_embeddings=pooled[num_positive:],
        )
        return MultipleTextEncodingOutput(out1, out2)
