"""SDXL Prompt-Free Generation (PFG) adapter.

Behavioral spec: /root/reference/src/models/sdxl/adapter/prompt_free.py
(316 LoC): a frozen vision backbone + a trainable projector turn a
reference image into N pseudo context tokens CONCATENATED to the prompt
embeddings along the sequence axis (positive batch gets the tokens,
negative batch gets zeros for CFG, reference prompt_free.py:197-206,
240-245). The UNet itself is untouched.

The vision encoder is a host-side callable (models/auto.py
AutoImageEncoder or any mock) — it is frozen in the reference trainer,
so it never needs to trace; the projector is a JAX module whose params
live under ``self.params["projector"]``.

Adapter checkpoints use the reference's projector./vision_encoder.
prefixes (prompt_free.py:92-112).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ....dataset.transform import ColorChannelSwap, PaddedResize, to_array
from ....modules.adapter.prompt_free import PFGConfig, PFGManager, ProjectionOutput
from ....nn import flatten_params, unflatten_params
from ....utils import safetensors as st
from ..config import SDXLConfig
from ..pipeline import SDXLModel


class SDXLModelWithPFGConfig(SDXLConfig):
    adapter: PFGConfig


class SDXLModelWithPFG(SDXLModel):
    """(reference SDXLModelWithPFG, prompt_free.py:21-316)."""

    config: SDXLModelWithPFGConfig

    def __init__(
        self,
        config: SDXLModelWithPFGConfig,
        tokenizer=None,
        image_encoder: Optional[Callable] = None,
        **kwargs,
    ):
        super().__init__(config, tokenizer=tokenizer, **kwargs)
        self.manager = PFGManager(adapter_config=config.adapter)
        self.projector = self.manager.get_projector(
            out_features=config.denoiser.context_dim
        )
        self.vision_encoder = image_encoder
        acfg = config.adapter
        self._resize = PaddedResize(acfg.image_size, fill=acfg.background_color)
        self._swap = ColorChannelSwap(
            swap=(2, 1, 0) if acfg.color_channel == "bgr" else (0, 1, 2),
            skip=acfg.color_channel == "rgb",
        )

    def _default_image_encoder(self):
        from ...auto import AutoImageEncoder, TimmModelConfig

        return AutoImageEncoder(TimmModelConfig(**self.config.adapter.image_encoder))

    def init_params(self, key: jax.Array, dtype=None) -> None:
        k1, k2 = jax.random.split(key)
        super().init_params(k1, dtype)
        self.params["projector"] = self.projector.init(k2, dtype or self.dtype)

    def init_adapter_params(self, key: jax.Array, dtype=None) -> None:
        self.params["projector"] = self.projector.init(key, dtype or self.dtype)

    def _from_checkpoint(self) -> None:
        super()._from_checkpoint()
        if path := self.config.adapter.checkpoint_weight:
            sd = st.load_file(path, dtype=self.dtype)
            self.params["projector"] = unflatten_params(
                {
                    k[len("projector."):]: v
                    for k, v in sd.items()
                    if k.startswith("projector.")
                }
            )
        else:
            self.init_adapter_params(jax.random.PRNGKey(0))

    def adapter_state_dict(self) -> dict[str, jax.Array]:
        return {
            f"projector.{k}": v
            for k, v in flatten_params(self.params["projector"]).items()
        }

    # -- reference image ----------------------------------------------------

    def preprocess_reference_image(self, reference_image) -> np.ndarray:
        """PIL image(s) -> normalized (B, 3, H, W) float numpy
        (reference prompt_free.py:42-65, 132-146)."""
        if isinstance(reference_image, Image.Image):
            reference_image = [reference_image]
        if isinstance(reference_image, (list, tuple)):
            acfg = self.config.adapter
            arrays = []
            for img in reference_image:
                arr = to_array(self._resize(img))  # (H, W, 3) uint8
                arr = self._swap(arr)
                arr = arr.astype(np.float32) / 255.0
                arr = (arr - np.asarray(acfg.image_mean)) / np.asarray(acfg.image_std)
                arrays.append(arr.transpose(2, 0, 1))
            return np.stack(arrays).astype(np.float32)
        return np.asarray(reference_image, np.float32)

    def encode_reference_image(self, pixel_values) -> jax.Array:
        if self.vision_encoder is None:
            self.vision_encoder = self._default_image_encoder()
        features = jnp.asarray(np.asarray(self.vision_encoder(pixel_values)))
        out: ProjectionOutput = self.projector(
            jax.tree.map(lambda x: x.astype(jnp.float32), self.params["projector"]),
            features.astype(jnp.float32),
        )
        return out.image_tokens

    # -- generate -------------------------------------------------------------

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

        encoder_output = self.text_encoder.encode_prompts(
            self.params["text_encoder"], prompt, negative_prompt,
            use_negative_prompts=do_cfg, max_token_length=max_token_length,
        )
        embeddings, pooled = self.prepare_encoder_hidden_states(encoder_output, do_cfg)

        if reference_image is not None:
            pixel_values = self.preprocess_reference_image(reference_image)
            image_tokens = self.encode_reference_image(pixel_values)
            image_tokens = jnp.tile(image_tokens, (batch_size, 1, 1))
            if do_cfg:
                # zeros for the negative batch (reference :200-206)
                image_tokens = jnp.concatenate(
                    [image_tokens, jnp.zeros_like(image_tokens)], axis=0
                )
            embeddings = jnp.concatenate(
                [embeddings, image_tokens.astype(embeddings.dtype)], axis=1
            )

        return self._generate_core(
            embeddings, pooled, batch_size, height, width,
            original_size, target_size, crop_coords_top_left,
            timesteps, sigmas, cfg_scale, do_cfg, seed, should_tile,
        )
