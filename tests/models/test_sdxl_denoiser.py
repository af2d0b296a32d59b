"""SDXL UNet parity vs the torch reference (tiny config, fp32, CPU).

Golden-reference tier (SURVEY.md §4): instantiate the reference Denoiser
with a small config, copy its randomly-initialized weights into the jax
param tree (same flattened keys), and require matching outputs.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tests")
from reference_loader import import_reference

from vision_ft_tpu.models.sdxl.config import DenoiserConfig
from vision_ft_tpu.models.sdxl.denoiser import Denoiser
from vision_ft_tpu.nn import flatten_params, unflatten_params

TINY = dict(
    in_channels=4,
    out_channels=4,
    hidden_dim=32,
    num_head_channels=8,
    context_dim=48,
    global_cond_dim=1280 + 6 * 256,
    block_out_channels=[32, 64, 128],
    # NOTE: must stay [1, 2, 10] — the reference UNet never forwards
    # num_transformers_per_block to DownBlocks (denoiser.py:1055-1070),
    # so its down path always uses the [1, 2, 10] defaults. Our build
    # uses the config consistently; the two agree exactly when the
    # config equals the default (true for every real SDXL checkpoint).
    num_transformers_per_block=[1, 2, 10],
    layers_per_block=2,
)


@pytest.fixture(scope="module")
def torch_ref():
    import functools

    import torch

    ref_denoiser = import_reference("src.models.sdxl.denoiser")
    ref_config_mod = import_reference("src.models.sdxl.config")
    # The reference always downcasts fp32 q/k/v to bf16 inside attention
    # (src/modules/attention.py:113-118) — a no-op for real bf16 runs. Pin
    # fp32 so the golden is exact.
    ref_denoiser.scaled_dot_product_attention = functools.partial(
        ref_denoiser.scaled_dot_product_attention, attention_dtype=torch.float32
    )
    torch.manual_seed(0)
    config = ref_config_mod.DenoiserConfig(**TINY)
    model = ref_denoiser.Denoiser(config).eval()
    return torch, model


def test_state_dict_keys_match(torch_ref):
    torch, ref_model = torch_ref
    jx = Denoiser(DenoiserConfig(**TINY))
    jax_keys = set(flatten_params(jx.init(jax.random.key(0))))
    ref_keys = set(ref_model.state_dict().keys())
    assert jax_keys == ref_keys, (
        f"missing={sorted(ref_keys - jax_keys)[:10]} extra={sorted(jax_keys - ref_keys)[:10]}"
    )


def test_forward_parity(torch_ref):
    torch, ref_model = torch_ref
    config = DenoiserConfig(**TINY)
    jx = Denoiser(config)

    flat = {
        k: jnp.asarray(v.detach().numpy()) for k, v in ref_model.state_dict().items()
    }
    params = unflatten_params(flat)

    rng = np.random.default_rng(42)
    b, h, w = 2, 16, 24
    latents = rng.standard_normal((b, 4, h, w), dtype=np.float32)
    timestep = np.array([999.0, 500.0], dtype=np.float32)
    ehs = rng.standard_normal((b, 77, TINY["context_dim"]), dtype=np.float32)
    pooled = rng.standard_normal((b, 1280), dtype=np.float32)
    original_size = np.array([[h * 8, w * 8]] * b, dtype=np.float32)
    target_size = original_size.copy()
    crop = np.zeros((b, 2), dtype=np.float32)

    with torch.no_grad():
        ref_out = ref_model(
            latents=torch.from_numpy(latents),
            timestep=torch.from_numpy(timestep),
            encoder_hidden_states=torch.from_numpy(ehs),
            encoder_pooler_output=torch.from_numpy(pooled),
            original_size=torch.from_numpy(original_size),
            target_size=torch.from_numpy(target_size),
            crop_coords_top_left=torch.from_numpy(crop),
        ).numpy()

    jax_out = jx(
        params,
        jnp.asarray(latents).transpose(0, 2, 3, 1),  # NCHW -> NHWC
        jnp.asarray(timestep),
        jnp.asarray(ehs),
        jnp.asarray(pooled),
        jnp.asarray(original_size),
        jnp.asarray(target_size),
        jnp.asarray(crop),
    )
    jax_out = np.asarray(jax_out).transpose(0, 3, 1, 2)

    assert jax_out.shape == ref_out.shape
    err = np.abs(jax_out - ref_out).max()
    assert err < 5e-4, f"max abs err {err}"


def test_gradient_checkpointing_same_output(torch_ref):
    config = DenoiserConfig(**TINY)
    jx = Denoiser(config)
    params = jx.init(jax.random.key(1))

    rng = np.random.default_rng(0)
    b, h, w = 1, 8, 8
    args = (
        jnp.asarray(rng.standard_normal((b, h, w, 4), dtype=np.float32)),
        jnp.asarray([10.0]),
        jnp.asarray(rng.standard_normal((b, 77, TINY["context_dim"]), dtype=np.float32)),
        jnp.asarray(rng.standard_normal((b, 1280), dtype=np.float32)),
        jnp.asarray([[64.0, 64.0]]),
        jnp.asarray([[64.0, 64.0]]),
        jnp.asarray([[0.0, 0.0]]),
    )
    out_plain = jx(params, *args)
    jx.set_gradient_checkpointing(True)
    out_ckpt = jx(params, *args)
    np.testing.assert_allclose(np.asarray(out_plain), np.asarray(out_ckpt), atol=1e-6)


def test_deepcache_forward():
    """DeepCache (opt-in inference acceleration): the refresh branch
    equals the plain forward bit-for-bit; the cached branch consumes the
    returned deep feature, produces the right shape, and equals the full
    forward when the deep feature is fresh for the same input."""
    import numpy as _np

    config = DenoiserConfig(**TINY)
    dn = Denoiser(config)
    params = dn.init(jax.random.key(0))
    b, h, w = 2, 16, 16
    rng = _np.random.default_rng(0)
    lat = jnp.asarray(rng.standard_normal((b, h, w, 4), _np.float32))
    t = jnp.full((b,), 500.0)
    ctx = jnp.asarray(rng.standard_normal((b, 7, TINY["context_dim"]), _np.float32))
    pooled = jnp.asarray(rng.standard_normal((b, 1280), _np.float32))
    size = jnp.full((b, 2), float(h * 8))
    crop = jnp.zeros((b, 2))
    args = (lat, t, ctx, pooled, size, size, crop)

    plain = dn(params, *args)
    # carry init: shape via eval_shape on the full branch
    deep_shape = jax.eval_shape(
        lambda: dn.deepcache_forward(
            params, *args, cached_deep=None, refresh=jnp.array(True)
        )[1]
    )
    zeros = jnp.zeros(deep_shape.shape, deep_shape.dtype)
    out_full, deep = jax.jit(
        lambda z: dn.deepcache_forward(
            params, *args, cached_deep=z, refresh=jnp.array(True)
        )
    )(zeros)
    np.testing.assert_allclose(np.asarray(out_full), np.asarray(plain), atol=1e-5, rtol=1e-5)

    out_cached, deep2 = jax.jit(
        lambda d: dn.deepcache_forward(
            params, *args, cached_deep=d, refresh=jnp.array(False)
        )
    )(deep)
    # cached pass reuses the deep feature untouched
    np.testing.assert_allclose(np.asarray(deep2), np.asarray(deep))
    assert out_cached.shape == plain.shape
    # a fresh deep feature for the SAME input makes the cached step exact
    np.testing.assert_allclose(
        np.asarray(out_cached), np.asarray(plain), atol=1e-5, rtol=1e-5
    )
