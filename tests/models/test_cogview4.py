"""CogView4 parity vs torch reference + GLM parity vs transformers + e2e."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tests")
from reference_loader import import_reference

from vision_ft_tpu.models.cogview4.config import CogView4Config, DenoiserConfig
from vision_ft_tpu.models.cogview4.denoiser import Denoiser
from vision_ft_tpu.nn import flatten_params, unflatten_params

TINY = dict(
    patch_size=2,
    in_channels=4,
    out_channels=4,
    num_layers=2,
    attention_head_dim=16,
    num_attention_heads=4,
    text_embed_dim=40,
    time_embed_dim=32,
    condition_dim=8,
    rope_axes_dim=[16, 16],
    attention_backend="eager",
)


def _torch_ref():
    import functools

    import torch

    ref_mod = import_reference("src.models.cogview4.denoiser")
    ref_cfg = import_reference("src.models.cogview4.config")
    attention = import_reference("src.modules.attention")
    ref_mod.scaled_dot_product_attention = functools.partial(
        attention.scaled_dot_product_attention, attention_dtype=torch.float32
    )
    torch.manual_seed(0)
    model = ref_mod.Denoiser(ref_cfg.DenoiserConfig(**TINY)).eval()
    return torch, model


def test_state_dict_keys_match():
    torch, ref = _torch_ref()
    ref_keys = set(ref.state_dict().keys())
    ours = Denoiser(DenoiserConfig(**TINY))
    our_keys = set(flatten_params(ours.init(jax.random.PRNGKey(0))).keys())
    assert our_keys == ref_keys


def test_forward_parity():
    torch, ref = _torch_ref()
    ours = Denoiser(DenoiserConfig(**TINY))
    params = unflatten_params(
        {k: jnp.asarray(v.detach().numpy()) for k, v in ref.state_dict().items()}
    )

    rng = np.random.default_rng(0)
    latent = rng.standard_normal((2, 4, 8, 8), np.float32)
    text = rng.standard_normal((2, 6, 40), np.float32)
    t = np.array([500.0, 100.0], np.float32)
    sizes = np.full((2, 2), 64.0, np.float32)
    crops = np.zeros((2, 2), np.float32)

    with torch.no_grad():
        expected = ref(
            latent=torch.from_numpy(latent),
            encoder_hidden_states=torch.from_numpy(text),
            timestep=torch.from_numpy(t),
            original_size=torch.from_numpy(sizes),
            target_size=torch.from_numpy(sizes),
            crop_coords=torch.from_numpy(crops),
        ).numpy()
    got = ours(
        params,
        jnp.asarray(latent.transpose(0, 2, 3, 1)),
        jnp.asarray(text),
        jnp.asarray(t),
        jnp.asarray(sizes), jnp.asarray(sizes), jnp.asarray(crops),
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), expected, atol=5e-4, rtol=5e-4
    )


def test_glm_parity_vs_transformers():
    import torch
    from transformers import GlmConfig as HFConfig
    from transformers.models.glm.modeling_glm import GlmModel as HFModel

    from vision_ft_tpu.models.text_encoders.glm import GlmConfig, GlmModel

    small = dict(
        vocab_size=256, hidden_size=32, intermediate_size=48, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
    )
    torch.manual_seed(0)
    hf = HFModel(
        HFConfig(**small, partial_rotary_factor=0.5, attention_bias=True, pad_token_id=0)
    ).eval()
    ours = GlmModel(GlmConfig(**small))
    flat = {k: jnp.asarray(v.detach().numpy()) for k, v in hf.state_dict().items()}
    assert set(flat.keys()) == set(
        flatten_params(ours.init(jax.random.PRNGKey(0))).keys()
    )
    params = unflatten_params(flat)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 256, (2, 12))
    with torch.no_grad():
        out = hf(input_ids=torch.from_numpy(ids), output_hidden_states=True)
        expected_final = out.last_hidden_state.numpy()
        expected_penult = out.hidden_states[-2].numpy()
    final, penult = ours(params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(final), expected_final, atol=3e-4, rtol=3e-4)
    np.testing.assert_allclose(np.asarray(penult), expected_penult, atol=3e-4, rtol=3e-4)


def _tiny_model():
    """Full tiny CogView4Model (DiT + GLM + KL-VAE) on random weights —
    shared by the pipeline e2e test and the continuous-batching adapter
    tests."""
    from vision_ft_tpu.models.autoencoder import AutoencoderKLConfig
    from vision_ft_tpu.models.cogview4.pipeline import CogView4Model
    from vision_ft_tpu.models.text_encoders.glm import GlmConfig

    class Tok:
        pad_token_id = 0

        def __call__(self, prompts, max_length=None, **kw):
            ids = []
            longest = max(len(p.split()) for p in prompts)
            for p in prompts:
                t = [3 + (hash(w) % 250) for w in p.split()][:max_length]
                ids.append(t + [0] * (longest - len(t)))
            return {"input_ids": ids}

    config = CogView4Config(
        checkpoint_path="unused", dtype="float32", denoiser=DenoiserConfig(**TINY)
    )
    return CogView4Model(
        config, tokenizer=Tok(),
        vae_config=AutoencoderKLConfig(
            block_out_channels=(8, 8, 16, 16), latent_channels=4, norm_num_groups=4,
            use_quant_conv=False, mid_block_add_attention=False,
            scaling_factor=1.0, shift_factor=0.0,
        ),
        text_encoder_config=GlmConfig(
            vocab_size=256, hidden_size=40, intermediate_size=48, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        ),
    )


def test_generate_end_to_end(tmp_path):
    model = _tiny_model()
    model.init_params(jax.random.PRNGKey(0))
    images = model.generate(
        "a cat on a mat", width=32, height=32, num_inference_steps=2,
        cfg_scale=3.5, seed=0,
    )
    assert len(images) == 1 and images[0].size == (32, 32)

    # deep_cache_interval=1 refreshes every step -> bit-exact vs plain
    images_dc = model.generate(
        "a cat on a mat", width=32, height=32, num_inference_steps=2,
        cfg_scale=3.5, seed=0, deep_cache_interval=1,
    )
    np.testing.assert_array_equal(np.asarray(images_dc[0]), np.asarray(images[0]))
    # interval 2 reuses the cached delta and still decodes a valid image
    images_dc2 = model.generate(
        "a cat on a mat", width=32, height=32, num_inference_steps=2,
        cfg_scale=3.5, seed=0, deep_cache_interval=2,
    )
    assert images_dc2[0].size == (32, 32)

    sd = model.state_dict()
    assert any(k.startswith("diffusion_model.") for k in sd)
    # on disk the text encoder drops the internal .model. level
    assert any(k.startswith("text_encoder.") for k in sd)
    assert not any(k.startswith("text_encoder.model.") for k in sd)
    from vision_ft_tpu.utils import safetensors as st

    path = str(tmp_path / "cogview4.safetensors")
    st.save_file(sd, path)
    model.config = CogView4Config(checkpoint_path=path, dtype="float32",
                                  denoiser=DenoiserConfig(**TINY))
    model._from_checkpoint()
    images2 = model.generate(
        "a cat on a mat", width=32, height=32, num_inference_steps=2,
        cfg_scale=3.5, seed=0,
    )
    np.testing.assert_allclose(
        np.asarray(images2[0], np.float32), np.asarray(images[0], np.float32), atol=1
    )


def test_deepcache_forward():
    """Delta-cached DiT forward: refresh pass is bit-identical to the plain
    forward; a cached pass on the SAME inputs reconstructs it to rounding;
    the cached program really skips the deep blocks (a NaN planted in the
    deepest block's params poisons refresh but not cached)."""
    ours = Denoiser(DenoiserConfig(**TINY))
    flat = flatten_params(ours.init(jax.random.PRNGKey(1)))
    params = unflatten_params({
        k: jax.random.normal(jax.random.fold_in(jax.random.PRNGKey(2), i),
                             v.shape, v.dtype) * 0.05
        if v.dtype.kind == "f" else v
        for i, (k, v) in enumerate(sorted(flat.items()))
    })
    rng = np.random.default_rng(3)
    latent = jnp.asarray(rng.standard_normal((2, 8, 8, 4), np.float32))
    text = jnp.asarray(rng.standard_normal((2, 6, 40), np.float32))
    t = jnp.asarray([500.0, 100.0], jnp.float32)
    sizes = jnp.full((2, 2), 64.0, jnp.float32)
    crops = jnp.zeros((2, 2), jnp.float32)
    args = (latent, text, t, sizes, sizes, crops)

    plain = ours(params, *args)
    full, delta = ours.deepcache_forward(params, *args, refresh=True)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(plain))

    cached, delta2 = ours.deepcache_forward(
        params, *args, cached_delta=delta, refresh=False
    )
    np.testing.assert_allclose(np.asarray(cached), np.asarray(plain),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(delta2), np.asarray(delta))

    # poison the deepest block: refresh sees it, cached does not
    bad = jax.tree_util.tree_map(lambda x: x, params)
    deepest = str(len(ours.transformer_blocks) - 1)
    bad["transformer_blocks"][deepest] = jax.tree_util.tree_map(
        lambda x: jnp.full_like(x, jnp.nan), bad["transformer_blocks"][deepest]
    )
    poisoned, _ = ours.deepcache_forward(bad, *args, refresh=True)
    assert not np.isfinite(np.asarray(poisoned)).all()
    clean, _ = ours.deepcache_forward(
        bad, *args, cached_delta=delta, refresh=False
    )
    assert np.isfinite(np.asarray(clean)).all()
