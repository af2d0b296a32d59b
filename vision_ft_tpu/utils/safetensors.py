"""Safetensors I/O for jax arrays.

Safetensors stays the interchange format with identical key layouts to the
reference (SURVEY.md §5.4); bf16 round-trips via safetensors.flax.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from safetensors.flax import load_file as _load_file
from safetensors.flax import save_file as _save_file


def load_file(path: str | os.PathLike, dtype=None) -> dict[str, jax.Array]:
    """Load a safetensors file into host jax arrays.

    Optional ``dtype`` casts every floating tensor on load — the jax
    equivalent of the reference's meta-device + dtype-assign load path
    (/root/reference/src/models/sdxl/pipeline.py:49-102): weights go
    straight from file bytes to arrays of the execution dtype without
    materializing a randomly-initialized tree first.
    """
    out = _load_file(str(path))
    if dtype is not None:
        out = {
            k: v.astype(dtype) if jnp.issubdtype(v.dtype, jnp.floating) else v
            for k, v in out.items()
        }
    return out


def read_keys(path: str | os.PathLike) -> list[str]:
    """Tensor names in a safetensors file WITHOUT loading any data — the
    8-byte little-endian header length followed by a JSON header (the
    on-disk format contract the bnb golden fixtures also pin down)."""
    import json
    import struct

    with open(path, "rb") as f:
        (n,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(n))
    return [k for k in header.keys() if k != "__metadata__"]


def save_file(
    tensors: dict[str, jax.Array], path: str | os.PathLike, metadata: dict[str, str] | None = None
) -> None:
    tensors = {k: jnp.asarray(v) for k, v in tensors.items()}
    _save_file(tensors, str(path), metadata=metadata)


def load_file_with_rename_key_map(
    path: str | os.PathLike, rename_key_map: dict[str, str] | None = None, dtype=None
) -> dict[str, jax.Array]:
    """Load and apply substring renames (reference: src/utils/safetensors.py:7-18)."""
    state_dict = load_file(path, dtype=dtype)
    if not rename_key_map:
        return state_dict
    renamed = {}
    for key, value in state_dict.items():
        for src, dst in rename_key_map.items():
            key = key.replace(src, dst)
        renamed[key] = value
    return renamed
