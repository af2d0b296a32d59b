"""Euler-discrete (+ancestral) scheduler for SDXL.

Numerics match the reference's hand-rolled EulerDiscreteScheduler
(/root/reference/src/models/sdxl/scheduler.py) exactly: sqrt-linspace
beta schedule, sigma interp over reversed integer timesteps, 1/sqrt(s^2+1)
input scaling, ancestral sigma_up/down split. Sigma tables are tiny
fp32/fp64 host arrays (numpy); the per-step math is jittable jnp.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class Scheduler:
    beta_start: float = 0.00085
    beta_end: float = 0.012
    num_train_timesteps: int = 1000
    steps_offset: int = 1

    def get_timesteps(self, num_inference_steps: int) -> np.ndarray:
        step_ratio = self.num_train_timesteps // num_inference_steps
        timesteps = (
            np.arange(self.num_train_timesteps, 0, -step_ratio)
            .round()
            .astype(np.float32)
            - 1
        )
        return timesteps + self.steps_offset

    def get_sigmas(self, timesteps: np.ndarray) -> np.ndarray:
        betas = (
            np.linspace(
                self.beta_start**0.5,
                self.beta_end**0.5,
                self.num_train_timesteps,
                dtype=np.float32,
            )
            ** 2
        )
        alphas_cumprod = np.cumprod(1.0 - betas, axis=0)
        sigmas = np.sqrt((1 - alphas_cumprod) / alphas_cumprod)
        sigmas = np.interp(timesteps, np.arange(0, len(sigmas)), sigmas)
        return np.concatenate([sigmas, [0.0]]).astype(np.float32)

    def get_max_noise_sigma(self, sigmas: np.ndarray) -> float:
        return float(np.sqrt(sigmas.max() ** 2 + 1))

    def scale_model_input(self, sample: jax.Array, current_sigma) -> jax.Array:
        return sample / jnp.sqrt(current_sigma**2 + 1)

    def ancestral_step(
        self,
        latent: jax.Array,
        noise_pred: jax.Array,
        sigma,
        next_sigma,
        noise: jax.Array,
    ) -> jax.Array:
        """Euler-ancestral update. ``noise`` is injected explicitly (jax
        has no randn_like; parity tests feed fixed noise — SURVEY.md §7)."""
        sigma_up = jnp.sqrt(next_sigma**2 * (sigma**2 - next_sigma**2) / sigma**2)
        sigma_down = jnp.sqrt(next_sigma**2 - sigma_up**2)
        dt = sigma_down - sigma
        return latent + noise_pred * dt + noise * sigma_up

    def step(self, latent: jax.Array, noise_pred: jax.Array, sigma, next_sigma) -> jax.Array:
        return latent + noise_pred * (next_sigma - sigma)
