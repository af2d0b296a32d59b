"""Train-time timestep samplers.

Behavioral spec: /root/reference/src/modules/timestep/sampling.py.
All samplers take an explicit PRNG key and a latents *shape* (NHWC) and
return a (B,) array; every op is jit-safe (fraction tables are static
constants folded by XLA).
"""

from __future__ import annotations

import math
from typing import Callable, Literal, Sequence

import jax
import jax.numpy as jnp
import numpy as np

TimestepSamplingType = Literal[
    "shift_sigmoid", "flux_shift", "sigmoid", "uniform", "scale_shift_sigmoid"
]


# -- flow-match (continuous t in [0,1]) --------------------------------------


def get_lin_function(
    x1: float = 256, y1: float = 0.5, x2: float = 4096, y2: float = 1.15
) -> Callable[[float], float]:
    m = (y2 - y1) / (x2 - x1)
    b = y1 - m * x1
    return lambda x: m * x + b


def time_shift(mu: float, sigma: float, t: jax.Array) -> jax.Array:
    return math.exp(mu) / (math.exp(mu) + (1.0 / t - 1.0) ** sigma)


def time_shift_linear(mu: float, t: jax.Array) -> jax.Array:
    """CogView4's linear shift (reference sampling.py:26-31)."""
    return mu / (mu + (1.0 / t - 1.0))


def sigmoid_randn(
    key: jax.Array, latents_shape: Sequence[int], sigmoid_scale: float = 1.0
) -> jax.Array:
    batch_size = latents_shape[0]
    logits = jax.random.normal(key, (batch_size,), jnp.float32) * sigmoid_scale
    return jax.nn.sigmoid(logits)


def shift_sigmoid_randn(
    key: jax.Array,
    latents_shape: Sequence[int],
    discrete_flow_shift: float = 3.1825,
    sigmoid_scale: float = 1.0,
) -> jax.Array:
    t = sigmoid_randn(key, latents_shape, sigmoid_scale)
    s = discrete_flow_shift
    return (t * s) / (1.0 + (s - 1.0) * t)


def flux_shift_randn(
    key: jax.Array, latents_shape: Sequence[int], sigmoid_scale: float = 1.0
) -> jax.Array:
    """Resolution-aware mu shift (reference sampling.py:34-49). NHWC shape."""
    _, height, width, _ = latents_shape
    t = sigmoid_randn(key, latents_shape, sigmoid_scale)
    mu = get_lin_function(y1=0.5, y2=1.15)((height // 2) * (width // 2))
    return time_shift(mu, 1.0, t)


def scale_shift_sigmoid_randn(
    key: jax.Array,
    latents_shape: Sequence[int],
    std: float = 0.8,
    mean: float = -0.8,
    **_: object,
) -> jax.Array:
    batch_size = latents_shape[0]
    z = jax.random.normal(key, (batch_size,), jnp.float32) * std + mean
    return jax.nn.sigmoid(z)


def uniform_rand(key: jax.Array, latents_shape: Sequence[int]) -> jax.Array:
    return jax.random.uniform(key, (latents_shape[0],), jnp.float32)


def shift_uniform_rand(
    key: jax.Array, latents_shape: Sequence[int], shift: float = 6.0
) -> jax.Array:
    t = uniform_rand(key, latents_shape)
    return (t * shift) / (1.0 + (shift - 1.0) * t)


def _create_fraction(denominators: Sequence[int]) -> np.ndarray:
    unique = {i / d for d in denominators for i in range(0, d + 1)}
    return np.array(sorted(unique), dtype=np.float32)


def fraction_uniform_rand(
    key: jax.Array,
    latents_shape: Sequence[int],
    divisible: Sequence[int] = tuple(range(20, 30)),
) -> jax.Array:
    """Sample t only from {i/d} grids (reference sampling.py:126-148)."""
    assert len(divisible) > 0, "divisible must not be empty"
    fractions = jnp.asarray(_create_fraction(divisible))
    idx = jax.random.randint(key, (latents_shape[0],), 0, fractions.shape[0])
    return fractions[idx]


def shift_fraction_uniform_rand(
    key: jax.Array,
    latents_shape: Sequence[int],
    shift: float = 6.0,
    divisible: Sequence[int] = tuple(range(20, 30)),
) -> jax.Array:
    t = fraction_uniform_rand(key, latents_shape, divisible)
    return (t * shift) / (1.0 + (shift - 1.0) * t)


def sample_timestep(
    key: jax.Array,
    latents_shape: Sequence[int],
    sampling_type: TimestepSamplingType = "sigmoid",
    **kwargs: object,
) -> jax.Array:
    if sampling_type == "shift_sigmoid":
        return shift_sigmoid_randn(key, latents_shape, **kwargs)
    if sampling_type == "flux_shift":
        return flux_shift_randn(key, latents_shape, **kwargs)
    if sampling_type == "sigmoid":
        return sigmoid_randn(key, latents_shape, **kwargs)
    if sampling_type == "uniform":
        return uniform_rand(key, latents_shape)
    if sampling_type == "scale_shift_sigmoid":
        return scale_shift_sigmoid_randn(key, latents_shape, **kwargs)
    raise ValueError(f"Invalid sampling type: {sampling_type}")


# -- diffusion (integer t) ---------------------------------------------------


def uniform_randint(
    key: jax.Array,
    latents_shape: Sequence[int],
    min_timesteps: int = 0,
    max_timesteps: int = 1000,
) -> jax.Array:
    return jax.random.randint(
        key, (latents_shape[0],), min_timesteps, max_timesteps, jnp.int32
    )


def gaussian_randint(
    key: jax.Array,
    latents_shape: Sequence[int],
    min_timesteps: int = 0,
    max_timesteps: int = 1000,
    mean: float = 500,
    std: float = 500,
) -> jax.Array:
    """Categorical over ints with Gaussian weights (reference sampling.py:210-233)."""
    idx = jnp.arange(min_timesteps, max_timesteps + 1, dtype=jnp.float32)
    logits = -0.5 * jnp.square((idx - mean) / std)
    draw = jax.random.categorical(key, logits, shape=(latents_shape[0],))
    return (draw + min_timesteps).astype(jnp.int32)


def sigmoid_randint(
    key: jax.Array,
    latents_shape: Sequence[int],
    min_timesteps: int = 0,
    max_timesteps: int = 1000,
    sigmoid_scale: float = 1.0,
) -> jax.Array:
    t = sigmoid_randn(key, latents_shape, sigmoid_scale)
    t = t * (max_timesteps - min_timesteps) + min_timesteps
    return jnp.round(t).astype(jnp.int32)
