"""Rectified-flow / flow-matching training losses.

Behavioral spec: /root/reference/src/modules/loss/flow_match.py.
Timestep convention matches the reference: t=1 is pure noise and t=0 is
clean data in :func:`prepare_noised_latents`; the "scaled" variant flips
that with ``clean_at_zero`` exactly as the reference does (flow_match.py:60-77).
Explicit PRNG keys; fp32 loss compute.
"""

from __future__ import annotations

from typing import Literal, NamedTuple

import jax
import jax.numpy as jnp

ModelPredictionType = Literal["noise", "velocity", "image"]  # eps, v, x0


class NoisedLatents(NamedTuple):
    noisy_latents: jax.Array
    random_noise: jax.Array


def _expand(timestep: jax.Array, like: jax.Array) -> jax.Array:
    return timestep.reshape((like.shape[0],) + (1,) * (like.ndim - 1)).astype(jnp.float32)


def prepare_noised_latents(
    key: jax.Array,
    latents: jax.Array,
    timestep: jax.Array,
    max_sigma: float = 1.0,
) -> NoisedLatents:
    """x_t = (1-t) x_0 + t * noise, noise ~ N(0, max_sigma^2)."""
    t = _expand(timestep, latents)
    noise = jax.random.normal(key, latents.shape, jnp.float32) * max_sigma
    noisy = (1.0 - t) * latents.astype(jnp.float32) + t * noise
    return NoisedLatents(noisy.astype(latents.dtype), noise.astype(latents.dtype))


def prepare_scaled_noised_latents(
    key: jax.Array,
    latents: jax.Array,
    timestep: jax.Array,
    noise_scale: float = 1.0,
    clean_at_zero: bool = False,
) -> NoisedLatents:
    t = _expand(timestep, latents)
    noise = jax.random.normal(key, latents.shape, jnp.float32) * noise_scale
    x0 = latents.astype(jnp.float32)
    if clean_at_zero:
        noisy = (1.0 - t) * x0 + t * noise
    else:
        noisy = t * x0 + (1.0 - t) * noise
    return NoisedLatents(noisy.astype(latents.dtype), noise.astype(latents.dtype))


def get_flow_match_target_velocity(
    latents: jax.Array, random_noise: jax.Array
) -> jax.Array:
    return random_noise - latents


def loss_with_predicted_velocity(
    latents: jax.Array,
    random_noise: jax.Array,
    predicted_velocity: jax.Array,
) -> jax.Array:
    """Mean MSE vs. target velocity (noise - latents), in fp32."""
    target = random_noise.astype(jnp.float32) - latents.astype(jnp.float32)
    diff = predicted_velocity.astype(jnp.float32) - target
    return jnp.mean(jnp.square(diff))


def convert_x0_to_velocity(
    x0: jax.Array,
    noisy_latents: jax.Array,
    timestep: jax.Array,
    eps: float = 1e-5,
    clean_at_zero: bool = False,
) -> jax.Array:
    """x0-prediction -> implied velocity (reference flow_match.py:103-116)."""
    t = _expand(timestep, x0)
    x0f = x0.astype(jnp.float32)
    xt = noisy_latents.astype(jnp.float32)
    if clean_at_zero:
        velocity = (xt - x0f) / jnp.maximum(t, eps)
    else:
        velocity = (x0f - xt) / jnp.maximum(1.0 - t, eps)
    return velocity.astype(x0.dtype)
