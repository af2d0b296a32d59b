"""Lumina2 flow-match Euler scheduler (reference src/models/lumina2/
scheduler.py): shift=6.0, REVERSED timesteps (0 -> 1, t=1 clean), Euler
step x <- x + v * (sigma - sigma_next), resolution-aware lognorm training
sampler."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ...modules.timestep.sampling import get_lin_function, sigmoid_randn


class Scheduler:
    shift: float = 6.0
    num_train_timesteps: int = 1000

    base_shift: float = 0.5
    max_shift: float = 1.15
    base_image_seq_len: int = 256
    max_image_seq_len: int = 4096

    def _calculate_sigma(self, num_inference_steps: int) -> np.ndarray:
        return np.linspace(1.0, 1 / num_inference_steps, num_inference_steps, dtype=np.float32)

    def get_timesteps(self, num_inference_steps: int) -> np.ndarray:
        sigmas = self._calculate_sigma(num_inference_steps)
        sigmas = self.shift * sigmas / (1 + (self.shift - 1) * sigmas)
        return 1 - sigmas  # Lumina2: 0.0 -> 1.0, t=1 is the clean image

    def get_sigmas(self, num_inference_steps: int) -> np.ndarray:
        sigmas = self._calculate_sigma(num_inference_steps)
        sigmas = self.shift * sigmas / (1 + (self.shift - 1) * sigmas)
        return np.concatenate([sigmas, [0]]).astype(np.float32)

    def sample_sigmoid_randn(
        self,
        key: jax.Array,
        latents_shape,
        patch_size: int = 2,
        sigma: float = 1.0,
    ) -> jax.Array:
        """Resolution-aware lognorm timestep sampling (reference
        scheduler.py:47-71). NHWC latents shape."""
        _, height, width, _ = latents_shape
        timesteps = sigmoid_randn(key, latents_shape)
        seq_len = (height // patch_size) * (width // patch_size)
        mu = get_lin_function(
            x1=self.base_image_seq_len,
            y1=self.base_shift,
            x2=self.max_image_seq_len,
            y2=self.max_shift,
        )(seq_len)
        timesteps = 1 - timesteps
        timesteps = math.exp(mu) / (math.exp(mu) + (1 / timesteps - 1) ** sigma)
        return 1 - timesteps

    def step(self, latent, velocity_pred, sigma, next_sigma):
        return latent + velocity_pred * (sigma - next_sigma)
