"""Flux-style multi-axis RoPE.

Behavioral spec: /root/reference/src/modules/positional_encoding/rope.py —
per-axis cos/sin frequency tables from (axis0, y, x) position indices,
fp32 even/odd rotation on (B, H, S, D) q/k; text tokens use all-zero
positions. Frequencies are computed in fp64-equivalent... the reference
uses torch.float64 for omega; we use fp32 (max |angle| here is small
enough that fp32 matches within 1e-6 for the table sizes in play).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ...nn import Module


def image_position_indices(
    height: int, width: int, rope_dim: int = 3, y_index: int = 1, x_index: int = 2
) -> np.ndarray:
    """(h/2 * w/2, rope_dim) of (0, y, x) patch positions (reference rope.py:5-31).
    height/width are latent sizes; positions are per 2x2 patch."""
    h, w = height // 2, width // 2
    pos = np.zeros((h, w, rope_dim), dtype=np.float32)
    pos[..., y_index] += np.arange(h, dtype=np.float32)[:, None]
    pos[..., x_index] += np.arange(w, dtype=np.float32)[None, :]
    return pos.reshape(-1, rope_dim)


def _axis_frequencies(position: np.ndarray, dim: int, theta: float) -> np.ndarray:
    assert dim % 2 == 0, "dim must be even"
    scale = np.arange(0, dim, 2, dtype=np.float64) / dim
    omega = 1.0 / (theta**scale)
    angles = np.outer(position.astype(np.float64), omega)  # (seq, dim//2)
    return np.stack([np.cos(angles), np.sin(angles)], axis=-1).astype(np.float32)


def get_rope_frequencies(
    position_indices: np.ndarray,  # (seq, n_axes)
    dim_sizes: Sequence[int],
    theta: float,
) -> np.ndarray:
    """(seq, sum(dim_sizes)//2, 2) cos/sin table (reference rope.py:61-80)."""
    assert len(dim_sizes) == position_indices.shape[-1]
    return np.concatenate(
        [
            _axis_frequencies(position_indices[..., i], dim, theta)
            for i, dim in enumerate(dim_sizes)
        ],
        axis=-2,
    )


def apply_rope(x: jax.Array, freqs: jax.Array) -> jax.Array:
    """Rotate (B, H, S, D) by freqs (S, D//2, 2), fp32 compute
    (reference rope.py:85-115: even/odd interleaved rotation)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    cos = freqs[..., 0]  # (S, D//2)
    sin = freqs[..., 1]
    even = xf[..., 0::2]
    odd = xf[..., 1::2]
    rotated = jnp.stack(
        [even * cos - odd * sin, even * sin + odd * cos], axis=-1
    ).reshape(xf.shape)
    return rotated.astype(dtype)


def apply_rope_qk(
    q: jax.Array, k: jax.Array, rope_freqs: jax.Array
) -> tuple[jax.Array, jax.Array]:
    return apply_rope(q, rope_freqs), apply_rope(k, rope_freqs)


class RoPEFrequency(Module):
    """Parameterless frequency provider (reference rope.py:136-162)."""

    def __init__(self, dim_sizes: Sequence[int], theta: float):
        self.dim_sizes = list(dim_sizes)
        self.theta = theta

    def init(self, key, dtype=jnp.float32):
        return {}

    def get_image_position_indices(
        self, height: int, width: int, y_index: int = 1, x_index: int = 2
    ) -> np.ndarray:
        return image_position_indices(height, width, len(self.dim_sizes), y_index, x_index)

    def get_text_position_indices(self, seq_len: int) -> np.ndarray:
        return np.zeros((seq_len, len(self.dim_sizes)), np.float32)

    def __call__(self, position_indices: np.ndarray) -> jax.Array:
        return jnp.asarray(
            get_rope_frequencies(position_indices, self.dim_sizes, self.theta)
        )
