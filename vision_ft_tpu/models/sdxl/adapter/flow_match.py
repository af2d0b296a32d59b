"""SDXL flow-match conversion: retarget the epsilon-trained SDXL UNet to
rectified-flow sampling.

Behavioral spec: /root/reference/src/models/sdxl/adapter/flow_match.py —
linear sigma schedule (1000 -> 1, sigma = t/1000, append 0), Euler updates
x <- x + v (next_sigma - sigma), model_prediction ∈ {velocity, image}
(x0 predictions converted to velocity), noise_scale on the initial latents.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ....modules.loss.flow_match import ModelPredictionType, convert_x0_to_velocity
from ....utils import tensor as tensor_utils
from ..config import SDXLConfig
from ..pipeline import SDXLModel


class SDXLFlowMatchConfig(SDXLConfig):
    model_prediction: ModelPredictionType = "velocity"
    noise_scale: float = 1.0

    clean_at_zero: bool = False
    timestep_eps: float = 1e-5


class SDXLFlowMatch(SDXLModel):
    config: SDXLFlowMatchConfig

    def prepare_timesteps(self, num_inference_steps: int):
        timesteps = np.linspace(1000.0, 1.0, num_inference_steps, dtype=np.float32)
        sigmas = np.concatenate([timesteps / 1000.0, [0.0]]).astype(np.float32)
        return timesteps, sigmas

    def _fm_step(
        self, params, latents, timestep, sigma, next_sigma, embeddings, pooled,
        original_size, target_size, crop_coords, cfg_scale, do_cfg: bool,
    ):
        model_input = jnp.concatenate([latents, latents]) if do_cfg else latents
        batch = model_input.shape[0]
        batch_timestep = jnp.broadcast_to(timestep, (batch,))
        model_pred = self.denoiser(
            params, model_input, batch_timestep, embeddings, pooled,
            original_size, target_size, crop_coords,
        )
        if self.config.model_prediction == "image":
            velocity = convert_x0_to_velocity(
                model_pred,
                model_input,
                batch_timestep / 1000.0,
                eps=self.config.timestep_eps,
                clean_at_zero=self.config.clean_at_zero,
            )
        elif self.config.model_prediction == "velocity":
            velocity = model_pred
        else:
            raise ValueError(f"Unknown model_prediction: {self.config.model_prediction}")
        if do_cfg:
            positive, negative = jnp.split(velocity, 2)
            velocity = negative + cfg_scale * (positive - negative)
        new_latents = latents.astype(jnp.float32) + velocity.astype(jnp.float32) * (
            next_sigma - sigma
        )
        return new_latents.astype(latents.dtype)

    def generate(
        self,
        prompt,
        negative_prompt=None,
        width: int = 768,
        height: int = 768,
        original_size: Optional[tuple[int, int]] = None,
        target_size: Optional[tuple[int, int]] = None,
        crop_coords_top_left: tuple[int, int] = (0, 0),
        num_inference_steps: int = 20,
        cfg_scale: float = 3.5,
        max_token_length: int = 75,
        seed: Optional[int] = None,
        do_offloading: bool = False,
    ) -> list[Image.Image]:
        do_cfg = cfg_scale > 1.0
        timesteps, sigmas = self.prepare_timesteps(num_inference_steps)
        batch_size = len(prompt) if isinstance(prompt, (list, tuple)) else 1
        original_size = original_size or (height, width)
        target_size = target_size or (height, width)

        encoder_output = self.text_encoder.encode_prompts(
            self.params["text_encoder"], prompt, negative_prompt,
            use_negative_prompts=do_cfg, max_token_length=max_token_length,
        )
        embeddings, pooled = self.prepare_encoder_hidden_states(encoder_output, do_cfg)
        embeddings = embeddings.astype(self.dtype)
        pooled = pooled.astype(self.dtype)

        latents = (
            self.prepare_latents(batch_size, height, width, 1.0, seed)
            * self.config.noise_scale
        )

        cond_batch = embeddings.shape[0]
        sizes = lambda t: jnp.broadcast_to(jnp.asarray(t, jnp.float32), (cond_batch, 2))
        from ....nn.core import cached_jit

        step = cached_jit(
            self, f"fm_step_{do_cfg}", partial(self._fm_step, do_cfg=do_cfg)
        )
        for i, t in enumerate(timesteps):
            latents = step(
                self.params["denoiser"], latents, jnp.float32(t),
                jnp.float32(sigmas[i]), jnp.float32(sigmas[i + 1]),
                embeddings, pooled, sizes(original_size), sizes(target_size),
                sizes(crop_coords_top_left), jnp.float32(cfg_scale),
            )
        return self.decode_image(latents, use_tiling=max(height, width) >= 1536)
