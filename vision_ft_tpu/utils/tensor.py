"""Tensor/image conversion helpers (jax-native).

Mirrors the reference's src/utils/tensor.py behavior with explicit PRNG
keys. ``incremental_seed_randn`` reproduces the per-sample-seed semantics
(sample i uses seed+i) so batched previews are order-independent; exact
torch RNG bit-parity is not possible across frameworks, so parity tests
inject fixed noise instead (SURVEY.md §7 hard part 1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image


@functools.partial(jax.jit, static_argnames=("shape", "dtype"))
def _incremental_seed_randn_jit(seed: jax.Array, shape, dtype) -> jax.Array:
    seeds = seed + jnp.arange(shape[0], dtype=jnp.int32)
    out = jax.vmap(
        lambda s: jax.random.normal(jax.random.PRNGKey(s), shape[1:], jnp.float32)
    )(seeds)
    return out.astype(dtype)


def incremental_seed_randn(
    shape: tuple[int, ...],
    seed: int | None,
    dtype=jnp.float32,
) -> jax.Array:
    """Standard-normal noise where batch element i is drawn from seed+i.

    (Reference: src/utils/tensor.py:11-36.) Jitted with the seed as a
    device scalar: called once per denoise step, the eager per-sample
    PRNGKey+normal chain cost 0.13 s/step of tunnel round trips.

    Seeds are wrapped into the int32 range (``seed & 0x7FFFFFFF``) so the
    value can live on-device: a seed at or beyond 2**31 reproduces the
    same noise as its wrapped value, not a distinct stream. Every
    ``generate(seed=...)`` across the pipelines shares this semantics.
    """
    if len(shape) == 0:
        raise ValueError("Shape must have at least one dimension")
    if seed is None:
        seed = int(np.random.randint(0, 2**31 - 1))
    # arbitrary Python-int seeds are accepted (PRNGKey parity); wrap into
    # int32 range deterministically — numpy >= 2.0 raises on overflow
    return _incremental_seed_randn_jit(
        jnp.int32(int(seed) & 0x7FFFFFFF), tuple(shape), dtype
    )


def image_to_tensor(image: Image.Image, dtype=jnp.float32) -> jax.Array:
    """PIL image -> NHWC float in [-1, 1]."""
    arr = np.asarray(image.convert("RGB"), dtype=np.float32) / 127.5 - 1.0
    return jnp.asarray(arr, dtype=dtype)


def images_to_tensor(images: list[Image.Image], dtype=jnp.float32) -> jax.Array:
    return jnp.stack([image_to_tensor(im, dtype) for im in images])


def tensor_to_images(tensor: jax.Array) -> list[Image.Image]:
    """NHWC float in [-1, 1] -> PIL images."""
    arr = np.asarray(jnp.clip(tensor, -1.0, 1.0).astype(jnp.float32))
    arr = np.nan_to_num(arr)  # NaN-safe (random-init tests; never silently wrap)
    arr = ((arr + 1.0) / 2.0 * 255.0).astype(np.uint8)
    return [Image.fromarray(im) for im in arr]


def videos_to_tensor(videos: list[list[Image.Image]], dtype=jnp.float32) -> jax.Array:
    """list of frame lists -> (B, F, H, W, C) float in [-1, 1]."""
    return jnp.stack([images_to_tensor(frames, dtype) for frames in videos])


def tensor_to_videos(tensor: jax.Array) -> list[list[Image.Image]]:
    """(B, F, H, W, C) float in [-1, 1] -> per-sample frame lists."""
    return [tensor_to_images(video) for video in tensor]
