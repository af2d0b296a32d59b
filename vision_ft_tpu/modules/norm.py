"""Shared norms (reference src/modules/norm.py).

FP32LayerNorm / FP32RMSNorm are the nn.core norms (those already compute
in fp32 islands); SingleAdaLayerNormZero is the zero-init adaLN head used
by the IP-Adapter adaln_zero variant (reference norm.py:37-90).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..nn import LayerNorm as FP32LayerNorm
from ..nn import Linear, Module, ModuleDict, RMSNorm as FP32RMSNorm
from ..nn import split_keys


class SingleAdaLayerNormZeroOutput(NamedTuple):
    hidden_states: jax.Array
    scale: jax.Array
    shift: jax.Array
    gate: jax.Array


class SingleAdaLayerNormZero(ModuleDict):
    """fp32 LN (no affine) + zero-init scale/shift and gate heads."""

    def __init__(self, hidden_dim: int, gate_dim: int, embedding_dim: int):
        self.norm = FP32LayerNorm(hidden_dim, eps=1e-6, elementwise_affine=False)
        super().__init__(
            {
                "scale_shift": Linear(embedding_dim, 2 * hidden_dim),
                "gate": Linear(embedding_dim, gate_dim),
            }
        )

    def init(self, key, dtype=jnp.float32):
        params = super().init(key, dtype)
        # zero-init (reference norm.py:59-69)
        for name in ("scale_shift", "gate"):
            params[name]["weight"] = jnp.zeros_like(params[name]["weight"])
            params[name]["bias"] = jnp.zeros_like(params[name]["bias"])
        return params

    def __call__(self, params, hidden_states, time_embed) -> SingleAdaLayerNormZeroOutput:
        normed = self.norm({}, hidden_states)
        t = jax.nn.silu(time_embed)
        scale, shift = jnp.split(self["scale_shift"](params["scale_shift"], t), 2, axis=1)
        gate = self["gate"](params["gate"], t)
        out = normed * (1 + scale[:, None, :]) + shift[:, None, :]
        return SingleAdaLayerNormZeroOutput(out.astype(hidden_states.dtype), scale, shift, gate)


__all__ = [
    "FP32LayerNorm",
    "FP32RMSNorm",
    "SingleAdaLayerNormZero",
    "SingleAdaLayerNormZeroOutput",
]
