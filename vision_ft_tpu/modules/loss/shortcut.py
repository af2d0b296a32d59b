"""Shortcut-model self-consistency loss pieces.

Behavioral spec: /root/reference/src/modules/loss/shortcut.py (One-Step
Diffusion via Shortcut Models, arXiv:2410.12557). Sampling quirks
preserved: inference-step exponents are drawn from sqrt-weighted
multinomial over [min_pow, max_pow) — exponent 0 has weight sqrt(0)=0 so
it is never drawn when min_pow=0 (reference :25-37); both consistency
predictions are multiplied by cfg_scale (reference :106-140).

Static-shape notes: the per-sample ``randint(1, steps_i + 1)`` departure
draw (a data-dependent high bound, reference :56-66) becomes
``floor(u * steps) + 1`` on a uniform u — the identical distribution,
trace-friendly.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class ShortcutDuration(NamedTuple):
    inference_steps: jax.Array
    shortcut_exponent: jax.Array
    shortcut_duration: jax.Array
    departure_timesteps: jax.Array


def sample_weighted_inference_step_exponent(
    key: jax.Array, batch_size: int, min_pow: int = 0, max_pow: int = 7
) -> jax.Array:
    exponents = jnp.arange(min_pow, max_pow)
    weights = jnp.sqrt(exponents.astype(jnp.float32))
    logits = jnp.log(weights / jnp.sum(weights))
    idx = jax.random.categorical(key, logits, shape=(batch_size,))
    return exponents[idx]


def prepare_random_shortcut_durations(
    key: jax.Array, batch_size: int, min_pow: int = 0, max_pow: int = 7
) -> ShortcutDuration:
    k_exp, k_dep = jax.random.split(key)
    exponent = sample_weighted_inference_step_exponent(
        k_exp, batch_size, min_pow, max_pow
    )
    inference_steps = jnp.power(2.0, exponent.astype(jnp.float32))
    shortcut_duration = 1.0 / inference_steps
    # randint(1, steps+1)/steps as floor(u*steps)+1 over steps
    u = jax.random.uniform(k_dep, (batch_size,))
    departure = (jnp.floor(u * inference_steps) + 1.0) / inference_steps
    return ShortcutDuration(
        inference_steps=inference_steps,
        shortcut_exponent=exponent,
        shortcut_duration=shortcut_duration,
        departure_timesteps=departure,
    )


class ShortcutTargets(NamedTuple):
    first_shortcut: jax.Array
    second_shortcut: jax.Array


def prepare_self_consistency_targets(
    denoise: Callable[[jax.Array, jax.Array, jax.Array], jax.Array],
    latents: jax.Array,  # noisy latents, NHWC
    departure_timesteps: jax.Array,
    double_shortcut_duration: jax.Array,
    cfg_scale: float = 1.0,
) -> ShortcutTargets:
    """Two half-duration predictions whose average is the self-consistency
    target (reference :101-151). ``denoise(latents, t, duration)`` is the
    caller-bound denoiser; everything here is fenced with stop_gradient."""
    half = double_shortcut_duration / 2.0
    first = denoise(latents, departure_timesteps, half) * cfg_scale
    pseudo_midpoint = latents - first * half[:, None, None, None].astype(latents.dtype)
    second = denoise(pseudo_midpoint, departure_timesteps - half, half) * cfg_scale
    return ShortcutTargets(
        first_shortcut=jax.lax.stop_gradient(first),
        second_shortcut=jax.lax.stop_gradient(second),
    )


def get_shortcut_target_velocity(
    first_shortcut: jax.Array, second_shortcut: jax.Array
) -> jax.Array:
    return (first_shortcut + second_shortcut) / 2.0


def loss_with_shortcut_self_consistency(
    first_shortcut: jax.Array,
    second_shortcut: jax.Array,
    double_shortcut: jax.Array,
) -> jax.Array:
    target = jax.lax.stop_gradient(
        get_shortcut_target_velocity(first_shortcut, second_shortcut)
    )
    return jnp.mean(
        jnp.square(double_shortcut.astype(jnp.float32) - target.astype(jnp.float32))
    )
