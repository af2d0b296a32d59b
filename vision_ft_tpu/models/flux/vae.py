"""Flux VAE: 16-channel KL autoencoder (reference src/models/flux/vae.py —
same module Lumina2 uses; note Flux's encode/decode do NOT apply the
shift_factor, reference pipeline.py:198-229)."""

from __future__ import annotations

from ..autoencoder import AutoencoderKL
from ..autoencoder.kl import FLUX_VAE_CONFIG

VAE_TENSOR_PREFIX = "vae."
DEFAULT_VAE_CONFIG = FLUX_VAE_CONFIG


class VAE(AutoencoderKL):
    compression_ratio = 8
    scaling_factor = 0.3611
    shift_factor = 0.1159
