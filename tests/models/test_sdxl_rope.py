"""SDXL RoPE retrofit adapter parity vs the torch reference."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tests")
from reference_loader import import_reference

from vision_ft_tpu.models.sdxl.adapter.rope import (
    DenoiserConfigWithRoPE,
    DenoiserWithRoPE,
    while_rope_disabled,
)
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
    num_transformers_per_block=[1, 2, 10],
    layers_per_block=2,
)
ROPE = dict(rope_enabled=True, rope_dims=[4, 4], origin_position="center")


@pytest.fixture(scope="module")
def torch_ref():
    import functools

    import torch

    ref_rope = import_reference("src.models.sdxl.adapter.rope")
    ref_cfg = import_reference("src.models.sdxl.config")
    # pin fp32 attention for an exact golden (reference downcasts to bf16)
    ref_rope.scaled_dot_product_attention = functools.partial(
        ref_rope.scaled_dot_product_attention, attention_dtype=torch.float32
    )
    torch.manual_seed(0)
    config = ref_rope.DenoiserConfigWithRoPE(**TINY, **ROPE)
    model = ref_rope.DenoiserWithRoPE(config).eval()
    # the reference denoiser does NOT thread rope geometry into blocks —
    # SDXLWithRoPEModel.apply_rope_config does it post-hoc (rope.py:536-543);
    # emulate that here
    for module in model.modules():
        if isinstance(module, ref_rope.RoPEEmbedder):
            module.rope_dims = config.rope_dims
            module.rope_theta = config.rope_theta
            module.origin_position = config.origin_position
    model.set_rope_enabled(True)
    return torch, model


def _inputs(rng):
    return dict(
        latents=rng.standard_normal((2, 4, 8, 8), np.float32),
        context=rng.standard_normal((2, 6, 48), np.float32),
        pooled=rng.standard_normal((2, 1280), np.float32),
        t=np.array([500.0, 100.0], np.float32),
        sizes=np.full((2, 2), 64.0, np.float32),
        crops=np.zeros((2, 2), np.float32),
    )


def test_rope_adds_no_parameters(torch_ref):
    torch, ref = torch_ref
    ours = DenoiserWithRoPE(DenoiserConfigWithRoPE(**TINY, **ROPE))
    our_keys = set(flatten_params(ours.init(jax.random.PRNGKey(0))).keys())
    base_keys = set(
        flatten_params(Denoiser(DenoiserConfig(**TINY)).init(jax.random.PRNGKey(0)))
    )
    assert our_keys == base_keys == set(ref.state_dict().keys())


def test_forward_parity(torch_ref):
    torch, ref = torch_ref
    ours = DenoiserWithRoPE(DenoiserConfigWithRoPE(**TINY, **ROPE))
    params = unflatten_params(
        {k: jnp.asarray(v.detach().numpy()) for k, v in ref.state_dict().items()}
    )
    x = _inputs(np.random.default_rng(0))

    with torch.no_grad():
        expected = ref(
            latents=torch.from_numpy(x["latents"]),
            timestep=torch.from_numpy(x["t"]),
            encoder_hidden_states=torch.from_numpy(x["context"]),
            encoder_pooler_output=torch.from_numpy(x["pooled"]),
            original_size=torch.from_numpy(x["sizes"]),
            target_size=torch.from_numpy(x["sizes"]),
            crop_coords_top_left=torch.from_numpy(x["crops"]),
        ).numpy()

    got = ours(
        params,
        jnp.asarray(x["latents"].transpose(0, 2, 3, 1)),
        jnp.asarray(x["t"]),
        jnp.asarray(x["context"]),
        jnp.asarray(x["pooled"]),
        jnp.asarray(x["sizes"]), jnp.asarray(x["sizes"]), jnp.asarray(x["crops"]),
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), expected, atol=5e-4, rtol=5e-4
    )


def test_disabled_rope_matches_base_denoiser():
    """With RoPE off, the retrofit must be bit-equivalent to vanilla SDXL
    (the reference teacher path, train/sdxl/rope_distill.py:205-222)."""
    base = Denoiser(DenoiserConfig(**TINY))
    retro = DenoiserWithRoPE(DenoiserConfigWithRoPE(**TINY, **ROPE))
    params = base.init(jax.random.PRNGKey(1))
    x = _inputs(np.random.default_rng(1))
    args = (
        jnp.asarray(x["latents"].transpose(0, 2, 3, 1)),
        jnp.asarray(x["t"]),
        jnp.asarray(x["context"]),
        jnp.asarray(x["pooled"]),
        jnp.asarray(x["sizes"]), jnp.asarray(x["sizes"]), jnp.asarray(x["crops"]),
    )
    expected = base(params, *args)
    with while_rope_disabled():
        got = retro(params, *args)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expected))
    # and enabled output must differ
    enabled = retro(params, *args)
    assert np.abs(np.asarray(enabled) - np.asarray(expected)).max() > 1e-6
