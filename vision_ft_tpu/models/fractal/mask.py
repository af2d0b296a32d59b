"""Mask generators for fractal masked-autoregressive training
(reference src/models/fractal/mask.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


class UniformMaskGenerator:
    """Mask the first k positions of a random order, k ~ U[1, seq]
    (reference :15-28). NOTE: the reference indexes
    ``orders[:, :num_masked_tokens]`` with a PER-BATCH tensor, which torch
    resolves using only the first element — a quirk we do not replicate;
    each row here masks its own k (the evident intent)."""

    def __call__(self, key: jax.Array, patches: jax.Array, orders: jax.Array) -> jax.Array:
        batch_size, seq_len = orders.shape
        k = jax.random.randint(key, (batch_size, 1), 1, seq_len + 1)
        ranks = jnp.argsort(orders, axis=-1)  # position -> rank in the order
        return (ranks < k).astype(jnp.float32)


class TruncatedNormalMaskGenerator:
    """Mask rate ~ TruncNormal(mean=1, std, [0, 1]); the first
    ceil(rate*seq) positions of the order are masked (reference :31-60)."""

    def __init__(self, std: float = 0.25):
        self.std = std

    def __call__(self, key: jax.Array, patches: jax.Array, orders: jax.Array) -> jax.Array:
        batch_size, seq_len = orders.shape
        # truncated normal on [0, 1] with mean 1: sample standard truncnorm
        # over [(0-1)/std, (1-1)/std] and shift
        z = jax.random.truncated_normal(
            key, lower=(0.0 - 1.0) / self.std, upper=0.0, shape=(batch_size,)
        )
        rates = 1.0 + self.std * z
        num_masked = jnp.ceil(rates * seq_len)
        ranks = jnp.argsort(orders, axis=-1)
        return (ranks < num_masked[:, None]).astype(jnp.bool_)
