"""Patchify / unpatchify for NHWC latents.

Behavioral spec: /root/reference/src/modules/patch.py and the AuraFlow
MMDiT's in-class versions (src/models/auraflow/denoiser.py:702-761).
Feature ordering matches the torch code exactly so checkpoints interop:
  patchify:   feature dim ordered (c, ph, pw)
  unpatchify: feature dim interpreted as (ph, pw, c)
(the asymmetry is the reference's; final_linear is trained to it.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn import Module


def patchify(latent: jax.Array, patch_size: int) -> jax.Array:
    """(B, H, W, C) -> (B, h*w, C*p*p) with (c, ph, pw) feature order."""
    b, height, width, c = latent.shape
    p = patch_size
    h, w = height // p, width // p
    x = latent.reshape(b, h, p, w, p, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # (B, h, w, C, p, p)
    return x.reshape(b, h * w, c * p * p)


def unpatchify(patches: jax.Array, height: int, width: int, patch_size: int, out_channels: int) -> jax.Array:
    """(B, h*w, p*p*c) -> (B, h*p, w*p, C) with (ph, pw, c) feature order.
    ``height``/``width`` are in patches."""
    b = patches.shape[0]
    p = patch_size
    x = patches.reshape(b, height, width, p, p, out_channels)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, h, p, w, p, C)
    return x.reshape(b, height * p, width * p, out_channels)


def unpatchify_cmajor(
    patches: jax.Array, height: int, width: int, patch_size: int, out_channels: int
) -> jax.Array:
    """(B, h*w, c*p*p) with (c, ph, pw) feature order -> NHWC. This is the
    reference's shared modules/patch.py unpatchify ordering (used by Flux
    and CogView4); AuraFlow/Lumina2 use the (ph, pw, c) variant above."""
    b = patches.shape[0]
    p = patch_size
    x = patches.reshape(b, height, width, out_channels, p, p)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # (b, h, p, w, p, c)
    return x.reshape(b, height * p, width * p, out_channels)


class ImagePatcher(Module):
    """Module wrapper (reference patch.py:119-174)."""

    def __init__(self, patch_size: int, out_channels: int):
        self.patch_size = patch_size
        self.out_channels = out_channels

    def init(self, key, dtype=jnp.float32):
        return {}

    def patchify(self, latent: jax.Array) -> jax.Array:
        return patchify(latent, self.patch_size)

    def unpatchify(self, patches: jax.Array, height: int, width: int) -> jax.Array:
        return unpatchify(patches, height, width, self.patch_size, self.out_channels)
