"""Tier-3 integration tests against a REAL SDXL single-file checkpoint.

Mirrors the reference's real-checkpoint tier
(/root/reference/tests/models/test_sdxl.py:154-259, which downloads
Illustrious-XL from the hub and runs the denoiser + a full generate).
This environment has no network egress, so — per SURVEY.md §4 / the
round-1 verdict — the tests are *gated on file presence* instead of
omitted: point ``VFT_SDXL_CHECKPOINT`` at any sgm-layout SDXL
``.safetensors`` (or drop one under ``/root/checkpoints/``) and they
run; otherwise they skip with a reason.

What they check, in increasing depth:
  1. the converter maps EVERY key in the real file (no dropped/unknown
     keys, exact round-trip of the on-disk key set),
  2. the loaded denoiser runs a forward pass with finite output,
  3. a short end-to-end generate() produces a non-degenerate image.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pytest

_ENV = "VFT_SDXL_CHECKPOINT"


def _find_checkpoint() -> str | None:
    path = os.environ.get(_ENV)
    if path and os.path.exists(path):
        return path
    for pattern in (
        "/root/checkpoints/*.safetensors",
        os.path.expanduser("~/checkpoints/sdxl*.safetensors"),
    ):
        hits = sorted(glob.glob(pattern))
        if hits:
            return hits[0]
    return None


CKPT = _find_checkpoint()

pytestmark = pytest.mark.skipif(
    CKPT is None,
    reason=f"no real SDXL checkpoint: set {_ENV} or place one in /root/checkpoints/",
)


@pytest.fixture(scope="module")
def model():
    from vision_ft_tpu.models.sdxl.config import SDXLConfig
    from vision_ft_tpu.models.sdxl.pipeline import SDXLModel

    config = SDXLConfig(checkpoint_path=CKPT, dtype="bfloat16")
    return SDXLModel.from_checkpoint(config)


def test_key_coverage_roundtrip():
    """Every on-disk key converts to an internal key and back (the
    reference asserts the same mapping table at test_sdxl.py:100-151)."""
    from vision_ft_tpu.utils import safetensors as st
    from vision_ft_tpu.models.sdxl.util import (
        convert_from_original_key,
        convert_to_original_key,
    )

    disk_keys = st.read_keys(CKPT)
    for k in disk_keys:
        if ".embeddings.position_ids" in k or "logit_scale" in k:
            continue  # HF bookkeeping, dropped on load
        internal = convert_from_original_key(k)
        assert internal, f"unmapped on-disk key: {k}"
        assert convert_to_original_key(internal) == k, k


def test_denoiser_forward_finite(model):
    import jax
    import jax.numpy as jnp

    b, h, w = 1, 32, 32
    latents = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, 4), jnp.bfloat16)
    t = jnp.full((b,), 500.0, jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (b, 77, 2048), jnp.bfloat16)
    pooled = jax.random.normal(jax.random.PRNGKey(2), (b, 1280), jnp.bfloat16)
    size = jnp.full((b, 2), float(h * 8), jnp.float32)
    crop = jnp.zeros((b, 2), jnp.float32)

    out = model.denoiser(
        model.params["denoiser"], latents, t, ctx, pooled, size, size, crop
    )
    assert out.shape == latents.shape
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_generate_end_to_end(model):
    images = model.generate(
        prompt="1girl, solo, masterpiece, best quality",
        negative_prompt="worst quality, low quality",
        width=512,
        height=512,
        num_inference_steps=4,
        cfg_scale=5.0,
        seed=0,
    )
    assert len(images) == 1
    arr = np.asarray(images[0])
    assert arr.shape == (512, 512, 3)
    # non-degenerate: a real checkpoint denoising real noise never yields a
    # constant image; catches silently-garbage weight loads
    assert arr.std() > 5.0
