"""Learnable 0->1 migration blend (reference src/modules/migration/scale.py):
used to blend learned-PE -> RoPE (and AuraFlow-VAE -> Flux-VAE patches) in
the migration trainers. The scale starts at zero and trains toward one;
once |1 - scale| drops below ``freezing_threshold`` the blend snaps to a
detached one (reference :21-28). Checkpoint loads always re-zero it
(reference :41-55)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...nn import Module


class MigrationScaleFromZero(Module):
    def __init__(self, dim: int = 1, freezing_threshold: Optional[float] = None):
        self.dim = dim
        self.freezing_threshold = freezing_threshold

    def init(self, key, dtype=jnp.float32):
        return {"scale": jnp.zeros((self.dim,), dtype)}

    def inner_scale(self, params) -> jax.Array:
        """The live scale, or detached ones once within the freezing
        threshold (reference inner_scale, scale.py:21-28). The branch is a
        data-dependent ``where`` so it traces."""
        scale = params["scale"].astype(jnp.float32)
        if self.freezing_threshold is None:
            return scale
        frozen = jnp.max(jnp.abs(1.0 - scale)) < self.freezing_threshold
        return jnp.where(frozen, jax.lax.stop_gradient(jnp.ones_like(scale)), scale)

    def scale_positive(self, params, x: jax.Array) -> jax.Array:
        return x * self.inner_scale(params).astype(x.dtype)

    def scale_negative(self, params, x: jax.Array) -> jax.Array:
        return x * (1.0 - self.inner_scale(params)).astype(x.dtype)

    def __call__(self, params, old_value: jax.Array, new_value: jax.Array) -> jax.Array:
        """Blend old * (1 - s) + new * s."""
        return self.scale_negative(params, old_value) + self.scale_positive(
            params, new_value
        )

    @staticmethod
    def rezero(params):
        """Checkpoint-load hook: the reference re-zeros on every load."""
        return {**params, "scale": jnp.zeros_like(params["scale"])}
