"""KL VAE invariants (diffusers golden unavailable offline — SURVEY.md §4).

Checks: diffusers key layout (snapshot of known keys), sgm->diffusers key
conversion closure, shape round-trips, tiled vs full decode agreement.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vision_ft_tpu.models.autoencoder import AutoencoderKL, AutoencoderKLConfig
from vision_ft_tpu.models.sdxl.util import (
    vae_convert_from_original_key,
    vae_convert_to_original_key,
)
from vision_ft_tpu.nn import flatten_params

TINY = AutoencoderKLConfig(
    block_out_channels=(8, 16, 16, 16), latent_channels=4, norm_num_groups=4
)


def test_key_layout():
    vae = AutoencoderKL(TINY)
    keys = set(flatten_params(vae.init(jax.random.key(0))))
    expected = {
        "encoder.conv_in.weight",
        "encoder.down_blocks.0.resnets.0.norm1.weight",
        "encoder.down_blocks.0.downsamplers.0.conv.weight",
        "encoder.down_blocks.1.resnets.0.conv_shortcut.weight",
        "encoder.mid_block.resnets.0.conv1.weight",
        "encoder.mid_block.attentions.0.to_q.weight",
        "encoder.mid_block.attentions.0.to_out.0.bias",
        "encoder.conv_norm_out.weight",
        "encoder.conv_out.bias",
        "quant_conv.weight",
        "post_quant_conv.bias",
        "decoder.conv_in.weight",
        "decoder.up_blocks.0.resnets.2.conv2.weight",
        "decoder.up_blocks.0.upsamplers.0.conv.weight",
        "decoder.up_blocks.3.resnets.0.conv_shortcut.weight",
        "decoder.conv_out.weight",
    }
    missing = expected - keys
    assert not missing, missing
    # last blocks have no resampler
    assert "encoder.down_blocks.3.downsamplers.0.conv.weight" not in keys
    assert "decoder.up_blocks.3.upsamplers.0.conv.weight" not in keys


def test_sgm_key_conversion_round_trip():
    vae = AutoencoderKL(TINY)
    keys = sorted(flatten_params(vae.init(jax.random.key(0))))
    for key in keys:
        prefixed = f"vae.{key}"
        original = vae_convert_to_original_key(prefixed)
        back = vae_convert_from_original_key(original)
        assert back == prefixed, (prefixed, original, back)
    # spot-check the sgm spellings
    assert (
        vae_convert_to_original_key("vae.decoder.up_blocks.0.resnets.1.norm1.weight")
        == "vae.decoder.up.3.block.1.norm1.weight"
    )
    assert (
        vae_convert_to_original_key("vae.encoder.mid_block.attentions.0.to_q.weight")
        == "vae.encoder.mid.attn_1.q.weight"
    )


def test_encode_decode_shapes_and_determinism():
    vae = AutoencoderKL(TINY)
    params = vae.init(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (1, 32, 32, 3))
    dist = vae.encode(params, x)
    assert dist.mean.shape == (1, 4, 4, 4)
    z = dist.sample(jax.random.key(2))
    np.testing.assert_array_equal(
        np.asarray(z), np.asarray(vae.encode(params, x).sample(jax.random.key(2)))
    )
    y = vae.decode(params, dist.mode())
    assert y.shape == (1, 32, 32, 3)


def test_tiled_decode():
    vae = AutoencoderKL(TINY)
    params = vae.init(jax.random.key(0))
    z = jax.random.normal(jax.random.key(3), (1, 16, 16, 4)) * 0.3
    full = np.asarray(vae.decode(params, z))

    # one tile covering everything == plain decode
    one_tile = np.asarray(vae.tiled_decode(params, z, tile_latent_size=32))
    np.testing.assert_allclose(one_tile, full, atol=1e-5)

    # multi-tile: same output geometry, finite values (numerics differ at
    # seams by construction — receptive fields are truncated per tile)
    tiled = np.asarray(vae.tiled_decode(params, z, tile_latent_size=8))
    assert tiled.shape == full.shape
    assert np.isfinite(tiled).all()
