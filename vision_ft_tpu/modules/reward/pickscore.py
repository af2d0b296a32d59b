"""PickScore reward model (reference src/modules/reward/pickscore.py).

The reference wraps the HF torch CLIP pipeline under ``torch.no_grad``,
which can score images but cannot back-propagate a reward — and its
DRaFT+ trainer indeed stops at a TODO (train/sdxl/draft_plus.py:235).
This build runs PickScore's CLIP-H natively in JAX (text tower from
models/text_encoders/clip.py, vision tower from
models/vision_encoders/clip_vision.py) so the differentiable
``score(images, prompt_ids)`` path exists and DRaFT+ can actually train.

Weights load from the HF ``yuvalkirstain/PickScore_v1`` state-dict layout
(text_model.*, vision_model.*, text_projection/visual_projection,
logit_scale) with nothing but unflatten.
"""

from __future__ import annotations

from typing import Literal, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...models.text_encoders.clip import CLIPTextConfig, CLIPTextModelWithProjection
from ...models.vision_encoders.clip_vision import (
    PICKSCORE_VISION_CONFIG,
    CLIPVisionConfig,
    CLIPVisionModelWithProjection,
    clip_preprocess,
)
from ...nn import unflatten_params
from .utils import RewardModelConfig, RewardModelMixin

# PickScore_v1 text tower (laion CLIP-H)
PICKSCORE_TEXT_CONFIG = CLIPTextConfig(
    vocab_size=49408,
    hidden_size=1024,
    intermediate_size=4096,
    num_hidden_layers=24,
    num_attention_heads=16,
    hidden_act="gelu",
    projection_dim=1024,
)


class PickScoreConfig(RewardModelConfig):
    type: Literal["pickscore"] = "pickscore"

    model_id: str = "yuvalkirstain/PickScore_v1"

    def load_model(self, device=None) -> "PickScoreRewardModel":
        return PickScoreRewardModel.from_pretrained(self.model_id)


class PickScoreRewardModel(RewardModelMixin):
    def __init__(
        self,
        params: dict,
        tokenizer=None,
        text_config: Optional[CLIPTextConfig] = None,
        vision_config: Optional[CLIPVisionConfig] = None,
    ):
        self.text_model = CLIPTextModelWithProjection(
            text_config or PICKSCORE_TEXT_CONFIG
        )
        self.vision_model = CLIPVisionModelWithProjection(
            vision_config or PICKSCORE_VISION_CONFIG
        )
        self.params = params
        self.tokenizer = tokenizer
        self.image_size = (vision_config or PICKSCORE_VISION_CONFIG).image_size

    @classmethod
    def from_pretrained(cls, model_id: str) -> "PickScoreRewardModel":
        """Load the HF torch checkpoint host-side and map its state dict
        into the JAX towers (key layouts match by construction)."""
        from transformers import AutoTokenizer, CLIPModel

        hf = CLIPModel.from_pretrained(model_id)
        flat = {k: jnp.asarray(v.numpy()) for k, v in hf.state_dict().items()}
        flat = {k: v for k, v in flat.items() if "position_ids" not in k}
        tokenizer = AutoTokenizer.from_pretrained(model_id)
        return cls(unflatten_params(flat), tokenizer=tokenizer)

    def init_params(self, key: jax.Array, dtype=jnp.float32) -> None:
        k1, k2 = jax.random.split(key)
        params: dict = {}
        params.update(self.text_model.init(k1, dtype))
        params.update(self.vision_model.init(k2, dtype))
        params["logit_scale"] = jnp.asarray(np.log(100.0), dtype)
        self.params = params

    # -- embeddings ------------------------------------------------------------

    def _text_params(self) -> dict:
        return {
            "text_model": self.params["text_model"],
            "text_projection": self.params["text_projection"],
        }

    def _vision_params(self) -> dict:
        return {
            "vision_model": self.params["vision_model"],
            "visual_projection": self.params["visual_projection"],
        }

    def text_embeds(self, input_ids: jax.Array) -> jax.Array:
        _, _, embeds = self.text_model(self._text_params(), input_ids)
        return embeds / jnp.linalg.norm(embeds, axis=-1, keepdims=True)

    def image_embeds(self, images: jax.Array) -> jax.Array:
        """images: NHWC float in [-1, 1] (in-graph, differentiable)."""
        pixels = clip_preprocess(images, self.image_size)
        _, embeds = self.vision_model(self._vision_params(), pixels)
        return embeds / jnp.linalg.norm(embeds, axis=-1, keepdims=True)

    # -- scoring -----------------------------------------------------------------

    def score(self, images: jax.Array, prompt_ids: jax.Array) -> jax.Array:
        """Per-sample PickScore (differentiable w.r.t. images):
        exp(logit_scale) * <text_i, image_i>."""
        t = self.text_embeds(prompt_ids)
        v = self.image_embeds(images)
        scale = jnp.exp(self.params["logit_scale"].astype(jnp.float32))
        return scale * jnp.sum(t * v, axis=-1)

    def __call__(self, images, prompts) -> jax.Array:
        """Host API mirroring the reference (pickscore.py:60-81): softmax
        over candidate images for the FIRST prompt."""
        from PIL import Image

        from ...utils import tensor as tensor_utils

        if isinstance(images, Image.Image):
            images = [images]
        image_tensor = tensor_utils.images_to_tensor(list(images))
        if isinstance(prompts, str):
            prompts = [prompts]
        if self.tokenizer is None:
            raise RuntimeError("No tokenizer configured for PickScoreRewardModel")
        out = self.tokenizer(
            prompts, padding="max_length", truncation=True, max_length=77,
            return_tensors="np",
        )
        ids = jnp.asarray(np.asarray(out["input_ids"]))
        t = self.text_embeds(ids)
        v = self.image_embeds(image_tensor)
        scale = jnp.exp(self.params["logit_scale"].astype(jnp.float32))
        scores = scale * (t @ v.T)[0]
        return jax.nn.softmax(scores, axis=-1)
