"""Lumina2 VAE: the 16-channel Flux KL autoencoder (reference
src/models/lumina2/vae.py — scaling 0.3611, shift 0.1159, no quant convs)."""

from __future__ import annotations

from ..autoencoder import AutoencoderKL
from ..autoencoder.kl import FLUX_VAE_CONFIG

VAE_TENSOR_PREFIX = "vae."
FLUX_VAE_COMPRESSION_RATIO = 8
FLUX_VAE_SCALING_FACTOR = 0.3611
FLUX_VAE_SHIFT_FACTOR = 0.1159

DEFAULT_VAE_CONFIG = FLUX_VAE_CONFIG


class VAE(AutoencoderKL):
    compression_ratio = FLUX_VAE_COMPRESSION_RATIO
    scaling_factor = FLUX_VAE_SCALING_FACTOR
    shift_factor = FLUX_VAE_SHIFT_FACTOR

    @classmethod
    def from_default(cls) -> "VAE":
        return cls(FLUX_VAE_CONFIG)
