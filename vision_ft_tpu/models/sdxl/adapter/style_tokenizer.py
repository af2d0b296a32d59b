"""SDXL style tokenizer adapter.

Behavioral spec: /root/reference/src/models/sdxl/adapter/style_tokenizer.py
(712 LoC): a ``<|style|>`` special token is appended to BOTH CLIP
tokenizers; at encode time a frozen vision backbone + trainable
projectors produce ``num_style_tokens`` embeddings per image that are
masked-scattered into each text tower's input embedding at the style
token positions (the prompt writes ``<|style|>`` once; it is expanded to
N copies, reference :67-80). Negative prompts get zero style vectors
(reference :141-151).

The token-embedding resize appends rows initialized to the mean of the
existing embeddings (the added rows are placeholders — the scatter
replaces them wherever the style token appears; HF's resize also
mean-initializes).

Adapter checkpoints use projector_1./projector_2./vision_encoder.
prefixes (reference :481-510).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ....dataset.transform import PaddedResize, to_array
from ....modules.adapter.style_tokenizer import (
    StyleTokenizerConfig,
    StyleTokenizerManager,
)
from ....modules.long_prompt import tokenize_long_prompt
from ....nn import flatten_params, unflatten_params
from ....utils import safetensors as st
from ..config import SDXLConfig
from ..pipeline import SDXLModel
from ..text_encoder import (
    CHUNK_LENGTH,
    MultipleTextEncodingOutput,
    TextEncoder,
    _merge_chunks,
    _merge_mask_chunks,
)
from ...utils import PooledTextEncodingOutput, TextEncodingOutput


class SDXLModelWithStyleTokenizerConfig(SDXLConfig):
    adapter: StyleTokenizerConfig


class ReferenceEncodeOutput(NamedTuple):
    style_tokens_1: jax.Array
    style_tokens_2: jax.Array


class TextEncoderWithStyle(TextEncoder):
    """(reference TextEncoderWithStyle, style_tokenizer.py:43-402)."""

    style_token: str = "<|style|>"
    num_style_tokens: int = 4
    style_token_id: Optional[int] = None

    def append_style_token_id(
        self, style_token: str = "<|style|>", num_style_tokens: int = 4
    ) -> None:
        if self.tokenizer is None:
            raise RuntimeError("No tokenizer configured")
        self.style_token = style_token
        self.num_style_tokens = num_style_tokens
        self.tokenizer.add_tokens(style_token, special_tokens=True)
        # one shared tokenizer -> one id for both towers (the reference
        # keeps two identical tokenizers, :54-58)
        self.style_token_id = self.tokenizer.convert_tokens_to_ids(style_token)

    def preprocess_style_token(self, prompts):
        if isinstance(prompts, str):
            return prompts.replace(
                self.style_token, self.style_token * self.num_style_tokens
            )
        if isinstance(prompts, (list, tuple)):
            return [
                p.replace(self.style_token, self.style_token * self.num_style_tokens)
                for p in prompts
            ]
        return prompts

    def encode_tokens_with_style(
        self,
        params,
        input_ids: jax.Array,
        batch: int,
        style_embeddings_1: Optional[jax.Array] = None,
        style_embeddings_2: Optional[jax.Array] = None,
    ):
        """Jittable core: chunked ids + per-tower style vectors -> merged
        embeddings (the style-aware analogue of encode_tokens)."""
        _, penult_1, _ = self.text_encoder_1(
            params["text_encoder_1"], input_ids,
            style_embeddings=style_embeddings_1, style_token_id=self.style_token_id,
        )
        _, penult_2, text_embeds = self.text_encoder_2(
            params["text_encoder_2"], input_ids,
            style_embeddings=style_embeddings_2, style_token_id=self.style_token_id,
        )
        emb1 = _merge_chunks(penult_1, batch)
        emb2 = _merge_chunks(penult_2, batch)
        pooled = text_embeds.reshape(batch, -1, text_embeds.shape[-1])[:, 0]
        return emb1, emb2, pooled

    def encode_prompts(
        self,
        params,
        prompts,
        style_tokens_1: Optional[jax.Array] = None,
        style_tokens_2: Optional[jax.Array] = None,
        negative_prompts=None,
        negative_style_tokens_1: Optional[jax.Array] = None,
        negative_style_tokens_2: Optional[jax.Array] = None,
        use_negative_prompts: bool = False,
        max_token_length: int = CHUNK_LENGTH,
    ) -> MultipleTextEncodingOutput:
        if self.tokenizer is None:
            raise RuntimeError("No tokenizer configured")
        _prompts, _negatives = self.normalize_prompts(
            self.preprocess_style_token(prompts),
            self.preprocess_style_token(negative_prompts)
            if negative_prompts is not None
            else None,
            use_negative_prompts,
        )
        num_positive = len(_prompts)
        all_prompts = _prompts + _negatives
        batch = len(all_prompts)

        ids, mask = tokenize_long_prompt(
            self.tokenizer, all_prompts,
            max_length=max_token_length, chunk_length=CHUNK_LENGTH,
        )
        ids = jnp.asarray(ids)

        def cat_styles(pos, neg):
            if pos is None:
                return None
            neg = jnp.zeros_like(pos) if neg is None else neg
            return jnp.concatenate([pos, neg], axis=0) if use_negative_prompts else pos

        emb1, emb2, pooled = self.encode_tokens_with_style(
            params, ids, batch,
            style_embeddings_1=cat_styles(style_tokens_1, negative_style_tokens_1),
            style_embeddings_2=cat_styles(style_tokens_2, negative_style_tokens_2),
        )
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


class SDXLModelWithStyleTokenizer(SDXLModel):
    """(reference SDXLModelWithStyleTokenizer, style_tokenizer.py:410-712)."""

    config: SDXLModelWithStyleTokenizerConfig
    text_encoder_class: type[TextEncoder] = TextEncoderWithStyle

    def __init__(
        self,
        config: SDXLModelWithStyleTokenizerConfig,
        tokenizer=None,
        image_encoder: Optional[Callable] = None,
        **kwargs,
    ):
        super().__init__(config, tokenizer=tokenizer, **kwargs)
        self.manager = StyleTokenizerManager(adapter_config=config.adapter)
        self.projector_1 = self.manager.get_projector(
            out_features=self.text_encoder.text_encoder_1.config.hidden_size
        )
        self.projector_2 = self.manager.get_projector(
            out_features=self.text_encoder.text_encoder_2.config.hidden_size
        )
        self.vision_encoder = image_encoder
        acfg = config.adapter
        self._resize = PaddedResize(acfg.image_size, fill=acfg.background_color)

    def _default_image_encoder(self):
        from ...auto import AutoImageEncoder, TimmModelConfig

        return AutoImageEncoder(TimmModelConfig(**self.config.adapter.image_encoder))

    # -- style token / embedding resize ---------------------------------------

    def setup_style_token(self) -> None:
        """Register the token and grow both token-embedding matrices
        (reference append_style_token_id + resize_token_embeddings,
        style_tokenizer.py:49-65)."""
        self.text_encoder.append_style_token_id(
            style_token=self.config.adapter.style_token,
            num_style_tokens=self.config.adapter.num_style_tokens,
        )
        new_size = len(self.text_encoder.tokenizer)
        for tower in ("text_encoder_1", "text_encoder_2"):
            emb = self.params["text_encoder"][tower]["text_model"]["embeddings"]
            w = emb["token_embedding"]["weight"]
            if w.shape[0] < new_size:
                mean_row = jnp.mean(w.astype(jnp.float32), axis=0, keepdims=True)
                pad = jnp.tile(mean_row, (new_size - w.shape[0], 1)).astype(w.dtype)
                emb["token_embedding"]["weight"] = jnp.concatenate([w, pad], axis=0)

    # -- params / checkpoints ---------------------------------------------------

    def init_params(self, key: jax.Array, dtype=None) -> None:
        k1, k2, k3 = jax.random.split(key, 3)
        super().init_params(k1, dtype)
        dtype = dtype or self.dtype
        self.params["projector_1"] = self.projector_1.init(k2, dtype)
        self.params["projector_2"] = self.projector_2.init(k3, dtype)
        self.setup_style_token()

    def _from_checkpoint(self) -> None:
        super()._from_checkpoint()
        self.setup_style_token()
        if path := self.config.adapter.checkpoint_weight:
            sd = st.load_file(path, dtype=self.dtype)
            for name in ("projector_1", "projector_2"):
                self.params[name] = unflatten_params(
                    {
                        k[len(name) + 1:]: v
                        for k, v in sd.items()
                        if k.startswith(f"{name}.")
                    }
                )
        else:
            k1, k2 = jax.random.split(jax.random.PRNGKey(0))
            self.params["projector_1"] = self.projector_1.init(k1, self.dtype)
            self.params["projector_2"] = self.projector_2.init(k2, self.dtype)

    def adapter_state_dict(self) -> dict[str, jax.Array]:
        flat = {}
        for name in ("projector_1", "projector_2"):
            flat.update(
                {f"{name}.{k}": v for k, v in flatten_params(self.params[name]).items()}
            )
        return flat

    # -- reference image ---------------------------------------------------------

    def preprocess_reference_image(self, reference_image) -> np.ndarray:
        if isinstance(reference_image, Image.Image):
            reference_image = [reference_image]
        if isinstance(reference_image, (list, tuple)):
            acfg = self.config.adapter
            arrays = []
            for img in reference_image:
                arr = to_array(self._resize(img)).astype(np.float32) / 255.0
                arr = (arr - np.asarray(acfg.image_mean)) / np.asarray(acfg.image_std)
                arrays.append(arr.transpose(2, 0, 1))
            return np.stack(arrays).astype(np.float32)
        return np.asarray(reference_image, np.float32)

    def encode_reference_image(self, pixel_values) -> ReferenceEncodeOutput:
        if self.vision_encoder is None:
            self.vision_encoder = self._default_image_encoder()
        features = jnp.asarray(np.asarray(self.vision_encoder(pixel_values))).astype(
            jnp.float32
        )
        tokens_1 = self.projector_1(
            jax.tree.map(lambda x: x.astype(jnp.float32), self.params["projector_1"]),
            features,
        ).style_tokens
        tokens_2 = self.projector_2(
            jax.tree.map(lambda x: x.astype(jnp.float32), self.params["projector_2"]),
            features,
        ).style_tokens
        return ReferenceEncodeOutput(tokens_1, tokens_2)

    # -- generate -------------------------------------------------------------------

    def generate(
        self,
        prompt,
        negative_prompt=None,
        reference_image=None,
        width: int = 768,
        height: int = 768,
        original_size=None,
        target_size=None,
        crop_coords_top_left=(0, 0),
        num_inference_steps: int = 20,
        cfg_scale: float = 3.5,
        max_token_length: int = 75,
        seed: Optional[int] = None,
    ) -> list[Image.Image]:
        do_cfg = cfg_scale > 1.0
        timesteps = self.scheduler.get_timesteps(num_inference_steps)
        sigmas = self.scheduler.get_sigmas(timesteps)
        batch_size = len(prompt) if isinstance(prompt, (list, tuple)) else 1
        original_size = original_size or (height, width)
        target_size = target_size or (height, width)
        should_tile = max(height, width) >= 1536

        if reference_image is not None:
            pixel_values = self.preprocess_reference_image(reference_image)
            tokens_1, tokens_2 = self.encode_reference_image(pixel_values)
        else:
            tokens_1 = tokens_2 = None

        encoder_output = self.text_encoder.encode_prompts(
            self.params["text_encoder"], prompt,
            style_tokens_1=tokens_1, style_tokens_2=tokens_2,
            negative_prompts=negative_prompt,
            use_negative_prompts=do_cfg, max_token_length=max_token_length,
        )
        embeddings, pooled = self.prepare_encoder_hidden_states(encoder_output, do_cfg)
        return self._generate_core(
            embeddings, pooled, batch_size, height, width,
            original_size, target_size, crop_coords_top_left,
            timesteps, sigmas, cfg_scale, do_cfg, seed, should_tile,
        )
