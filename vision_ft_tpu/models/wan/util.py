"""Wan checkpoint key converters (reference src/models/wan/util.py).
Wan ships three separate safetensors files (denoiser/text_encoder/vae);
the text encoder gains a ``model.`` prefix internally, the denoiser drops
its on-disk ``model.`` prefix."""

from __future__ import annotations

from typing import Literal


def text_encoder_convert_from_original_key(key: str) -> str:
    return key if key.startswith("model.") else f"model.{key}"


def text_encoder_convert_to_original_key(key: str) -> str:
    return key[6:] if key.startswith("model.") else key


def denoiser_convert_from_original_key(key: str) -> str:
    return key[6:] if key.startswith("model.") else key


def denoiser_convert_to_original_key(key: str) -> str:
    return key if key.startswith("model.") else f"model.{key}"


def vae_convert_from_original_key(key: str) -> str:
    return key


def vae_convert_to_original_key(key: str) -> str:
    return key


def convert_from_original_key(
    key: str, module: Literal["text_encoder", "denoiser", "vae"]
) -> str:
    return {
        "text_encoder": text_encoder_convert_from_original_key,
        "denoiser": denoiser_convert_from_original_key,
        "vae": vae_convert_from_original_key,
    }[module](key)


def convert_to_original_key(
    key: str, module: Literal["text_encoder", "denoiser", "vae"]
) -> str:
    return {
        "text_encoder": text_encoder_convert_to_original_key,
        "denoiser": denoiser_convert_to_original_key,
        "vae": vae_convert_to_original_key,
    }[module](key)
