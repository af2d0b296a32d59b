"""DDPM epsilon-prediction training loss (SDXL).

Behavioral spec: /root/reference/src/modules/loss/diffusion.py:15-68.
TPU-native deltas: explicit PRNG key instead of torch global RNG; latents
are NHWC; the beta/alpha-cumprod table is computed in fp32 inside jit (it
constant-folds under XLA, so there is no per-step cost).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class NoisedLatents(NamedTuple):
    noisy_latents: jax.Array
    random_noise: jax.Array


def get_alphas_cumprod(
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    num_train_timesteps: int = 1000,
) -> jax.Array:
    """SD-style scaled-linear schedule: linspace on sqrt(beta), squared."""
    betas = (
        jnp.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=jnp.float32)
        ** 2
    )
    return jnp.cumprod(1.0 - betas)


def prepare_noised_latents(
    key: jax.Array,
    latents: jax.Array,
    timestep: jax.Array,
    max_sigma: float = 1.0,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    num_train_timesteps: int = 1000,
) -> NoisedLatents:
    """Forward-process q(x_t | x_0) sample.

    ``timestep``: int array (B,), 0 <= t < num_train_timesteps.
    """
    alphas_cumprod = get_alphas_cumprod(beta_start, beta_end, num_train_timesteps)
    a = alphas_cumprod[timestep].reshape((latents.shape[0],) + (1,) * (latents.ndim - 1))
    a = a.astype(jnp.float32)

    random_noise = (
        jax.random.normal(key, latents.shape, jnp.float32) * max_sigma
    )
    noisy = (
        jnp.sqrt(a) * latents.astype(jnp.float32)
        + jnp.sqrt(1.0 - a) * random_noise
    )
    return NoisedLatents(noisy.astype(latents.dtype), random_noise.astype(latents.dtype))


def loss_with_predicted_noise(
    latents: jax.Array,  # unused; kept for reference signature parity
    random_noise: jax.Array,
    predicted_noise: jax.Array,
) -> jax.Array:
    """Mean MSE vs. the injected noise, in fp32."""
    diff = predicted_noise.astype(jnp.float32) - random_noise.astype(jnp.float32)
    return jnp.mean(jnp.square(diff))


def min_snr_weighted_loss(
    latents: jax.Array,  # unused; kept for signature symmetry
    random_noise: jax.Array,
    predicted_noise: jax.Array,
    timestep: jax.Array,
    gamma: float = 5.0,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    num_train_timesteps: int = 1000,
) -> jax.Array:
    """Min-SNR-gamma weighted epsilon MSE (Hang et al. 2023,
    arXiv:2303.09556) — beyond the reference, which has no timestep loss
    weighting. Per-sample weight = min(SNR(t), gamma) / SNR(t) with
    SNR(t) = a / (1 - a); down-weights the low-noise timesteps whose
    near-trivial denoising objective otherwise dominates the gradient.
    Reduces to the unweighted loss as gamma -> inf."""
    alphas_cumprod = get_alphas_cumprod(beta_start, beta_end, num_train_timesteps)
    a = alphas_cumprod[timestep].astype(jnp.float32)  # (B,)
    snr = a / (1.0 - a)
    weight = jnp.minimum(snr, gamma) / snr  # (B,)
    diff = predicted_noise.astype(jnp.float32) - random_noise.astype(jnp.float32)
    per_sample = jnp.mean(
        jnp.square(diff).reshape(diff.shape[0], -1), axis=1
    )
    return jnp.mean(weight * per_sample)
