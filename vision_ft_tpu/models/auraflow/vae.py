"""AuraFlow VAE: SDXL-compatible KL autoencoder (reference
src/models/auraflow/vae.py — same 4-ch latents, scaling 0.13025)."""

from __future__ import annotations

from typing import Any

from ..autoencoder import AutoencoderKL
from ..autoencoder.kl import SDXL_VAE_CONFIG

VAE_TENSOR_PREFIX = "vae."
AURA_VAE_COMPRESSION_RATIO = 8
AURA_VAE_SCALING_FACTOR = 0.13025

DEFAULT_VAE_CONFIG = SDXL_VAE_CONFIG


def detect_vae_type(state_dict: dict[str, Any]) -> str:
    """"original" (sgm naming) vs "autoencoder_kl" (diffusers naming)
    (reference vae.py:48-56)."""
    if "vae.encoder.norm_out.weight" in state_dict:
        return "original"
    if "vae.encoder.conv_norm_out.weight" in state_dict:
        return "autoencoder_kl"
    raise ValueError("Unknown VAE type")


class VAE(AutoencoderKL):
    compression_ratio = AURA_VAE_COMPRESSION_RATIO
    scaling_factor = AURA_VAE_SCALING_FACTOR
