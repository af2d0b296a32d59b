"""Learnable 0->1 migration blend (reference src/modules/migration/scale.py):
used to blend learned-PE -> RoPE in migration trainers. The scale starts at
zero, trains toward one, and freezes past a threshold; checkpoint loads
always re-zero it (reference :41-55)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...nn import Module


class MigrationScaleFromZero(Module):
    def __init__(self, dim: int = 1, freeze_threshold: float = 1.0):
        self.dim = dim
        self.freeze_threshold = freeze_threshold

    def init(self, key, dtype=jnp.float32):
        return {"scale": jnp.zeros((self.dim,), dtype)}

    def __call__(self, params, old_value: jax.Array, new_value: jax.Array) -> jax.Array:
        """old * (1 - s) + new * s, with s clamped to [0, 1] and frozen
        (stop_gradient) once it crosses the threshold."""
        scale = jnp.clip(params["scale"].astype(old_value.dtype), 0.0, 1.0)
        frozen = jnp.where(
            scale >= self.freeze_threshold, jax.lax.stop_gradient(scale), scale
        )
        return old_value * (1.0 - frozen) + new_value * frozen

    @staticmethod
    def rezero(params):
        """Checkpoint-load hook: the reference re-zeros on every load."""
        return {**params, "scale": jnp.zeros_like(params["scale"])}
