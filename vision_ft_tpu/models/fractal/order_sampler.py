"""Random generation-order sampling (reference
src/models/fractal/order_sampler.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_order(key: jax.Array, batch_size: int, sequence_length: int) -> jax.Array:
    """(batch, seq) random permutations via argsort of uniforms."""
    u = jax.random.uniform(key, (batch_size, sequence_length))
    return jnp.argsort(u, axis=-1)
