"""FractalGen modules parity vs torch reference."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tests")
from reference_loader import import_reference

from vision_ft_tpu.models.fractal import (
    FractalMaskedTransformer,
    PixelTransformer,
    TruncatedNormalMaskGenerator,
    UniformMaskGenerator,
    sample_order,
)
from vision_ft_tpu.nn import flatten_params, unflatten_params

TINY = dict(
    patch_size=2,
    condition_embedding_dim=24,
    hidden_dim=32,
    num_blocks=2,
    num_heads=4,
    in_channels=3,
    out_channels=3,
)


def _ref_generator(use_guiding_pixel=False):
    import functools

    import torch

    ref = import_reference("src.models.fractal.generator")
    attention = import_reference("src.modules.attention")
    ref.scaled_dot_product_attention = functools.partial(
        attention.scaled_dot_product_attention, attention_dtype=torch.float32
    )
    torch.manual_seed(0)
    model = ref.FractalMaskedTransformer(
        **TINY, attention_backend="eager", use_guiding_pixel=use_guiding_pixel
    ).eval()
    return torch, model


def test_generator_state_dict_keys():
    torch, ref = _ref_generator(use_guiding_pixel=True)
    ours = FractalMaskedTransformer(**TINY, use_guiding_pixel=True)
    our_keys = set(flatten_params(ours.init(jax.random.PRNGKey(0))).keys())
    assert our_keys == set(ref.state_dict().keys())


def test_generator_predict_mask_parity():
    """Component parity: the reference's full forward() crashes on its own
    view (generator.py:435 reshapes a hidden-dim tensor with the PATCH
    channel count — the module is unfinished upstream), so parity is
    checked on the well-formed pieces: predict_mask and the 5-way shift."""
    torch, ref = _ref_generator(use_guiding_pixel=False)
    ours = FractalMaskedTransformer(**TINY)
    params = unflatten_params(
        {k: jnp.asarray(v.detach().numpy()) for k, v in ref.state_dict().items()}
    )

    rng = np.random.default_rng(0)
    image = rng.standard_normal((2, 3, 8, 8), np.float32)  # NCHW for torch
    condition = rng.standard_normal((2, 3, 32), np.float32)  # at hidden_dim
    mask = np.zeros((2, 16), bool)
    mask[0, [1, 5, 7]] = True
    mask[1, [0, 2]] = True

    with torch.no_grad():
        t_patches, lh, lw = ref.patchify(torch.from_numpy(image))
        expected_pred = ref.predict_mask(
            patches=t_patches,
            mask=torch.from_numpy(mask),
            condition=torch.from_numpy(condition),
        )
        expected_shifted = ref._shifted_patches(expected_pred, lh, lw)

    j_patches, jlh, jlw = ours.patchify(jnp.asarray(image.transpose(0, 2, 3, 1)))
    assert (jlh, jlw) == (lh, lw)
    np.testing.assert_allclose(
        np.asarray(j_patches), t_patches.numpy(), atol=1e-6, rtol=1e-6
    )
    got_pred = ours.predict_mask(
        params, j_patches, jnp.asarray(mask), jnp.asarray(condition)
    )
    np.testing.assert_allclose(
        np.asarray(got_pred), expected_pred.numpy(), atol=2e-5, rtol=2e-5
    )
    got_shifted = ours.get_surrounding_patches(got_pred, jlh, jlw)
    np.testing.assert_allclose(
        np.asarray(got_shifted).reshape(expected_shifted.shape),
        expected_shifted.numpy(), atol=2e-5, rtol=2e-5,
    )

    # our full forward stays well-formed where the reference's crashes
    out = ours(
        params, jnp.asarray(image.transpose(0, 2, 3, 1)),
        jnp.asarray(condition), jnp.asarray(mask),
    )
    assert out.mask_prediction.shape == (2, 16, 32)
    assert out.surrounding_patches.shape == (5, 2, 16, 32)
    assert float(out.guiding_pixel_loss) == 0.0


def test_pixel_transformer_parity():
    import functools

    import torch

    ref_mod = import_reference("src.models.fractal.pixel")
    attention = import_reference("src.modules.attention")
    ref_mod.scaled_dot_product_attention = functools.partial(
        attention.scaled_dot_product_attention, attention_dtype=torch.float32
    )
    torch.manual_seed(0)
    ref = ref_mod.PixelTransformer(
        channels=3, hidden_dim=32, num_blocks=2, num_heads=4,
        attention_backend="eager",
    ).eval()
    ours = PixelTransformer(channels=3, hidden_dim=32, num_blocks=2, num_heads=4)
    flat = {k: jnp.asarray(v.detach().numpy()) for k, v in ref.state_dict().items()}
    assert set(flat.keys()) == set(
        flatten_params(ours.init(jax.random.PRNGKey(0))).keys()
    )
    params = unflatten_params(flat)

    rng = np.random.default_rng(0)
    cond = rng.standard_normal((2, 3, 3), np.float32)  # (B, S, channels=3)
    gt = rng.integers(0, 256, (2, 3)).astype(np.float32) / 255.0  # exact grid

    with torch.no_grad():
        expected = ref(
            guiding_condition=torch.from_numpy(cond),
            ground_truth=torch.from_numpy(gt),
        )
    got = ours(params, jax.random.PRNGKey(0), jnp.asarray(cond), jnp.asarray(gt))
    # labels land on the same integers (the 1e-2 dither can't cross 0.5)
    np.testing.assert_array_equal(np.asarray(got.labels), expected.labels.numpy())
    np.testing.assert_allclose(
        np.asarray(got.logits), expected.logits.numpy(), atol=2e-5, rtol=2e-5
    )


def test_order_and_masks():
    orders = sample_order(jax.random.PRNGKey(0), 4, 16)
    assert orders.shape == (4, 16)
    for row in np.asarray(orders):
        assert sorted(row.tolist()) == list(range(16))

    patches = jnp.zeros((4, 16, 8))
    m1 = UniformMaskGenerator()(jax.random.PRNGKey(1), patches, orders)
    counts = np.asarray(m1).sum(axis=1)
    assert ((counts >= 1) & (counts <= 16)).all()

    m2 = TruncatedNormalMaskGenerator(std=0.25)(jax.random.PRNGKey(2), patches, orders)
    counts2 = np.asarray(m2).sum(axis=1)
    assert ((counts2 >= 0) & (counts2 <= 16)).all()
    # mean mask rate should be high (mean=1 truncated normal)
    assert counts2.mean() > 8
