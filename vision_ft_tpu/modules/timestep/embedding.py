"""Sinusoidal timestep embeddings (diffusers-compatible).

Numerics match the reference's get_timestep_embedding
(/root/reference/src/modules/timestep/embedding.py:10-62) bit-for-bit in
fp32 so SDXL micro-conditioning embeds identically.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ...nn import Linear, Module, split_keys


def get_timestep_embedding(
    timesteps: jax.Array,
    embedding_dim: int,
    flip_sin_to_cos: bool = False,
    downscale_freq_shift: float = 1.0,
    scale: float = 1.0,
    max_period: int = 10000,
) -> jax.Array:
    """(N,) fractional timesteps -> (N, embedding_dim) sinusoid embedding."""
    assert timesteps.ndim == 1, "Timesteps should be a 1d-array"
    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = jnp.exp(exponent)
    emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
    emb = scale * emb
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half_dim:], emb[:, :half_dim]], axis=-1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedding(Module):
    """linear_1 -> silu -> linear_2 MLP over a sinusoid embedding."""

    def __init__(self, in_channels: int, time_embed_dim: int, bias: bool = True):
        self.linear_1 = Linear(in_channels, time_embed_dim, bias=bias)
        self.linear_2 = Linear(time_embed_dim, time_embed_dim, bias=bias)

    def init(self, key, dtype=jnp.float32):
        keys = split_keys(key, ["linear_1", "linear_2"])
        return {
            "linear_1": self.linear_1.init(keys["linear_1"], dtype),
            "linear_2": self.linear_2.init(keys["linear_2"], dtype),
        }

    def __call__(self, params, x):
        h = self.linear_1(params["linear_1"], x)
        h = jax.nn.silu(h)
        return self.linear_2(params["linear_2"], h)
