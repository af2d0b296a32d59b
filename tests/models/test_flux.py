"""Flux parity vs torch reference + tiny end-to-end generate."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tests")
from reference_loader import import_reference

from vision_ft_tpu.models.flux.config import DenoiserConfig, FluxConfig
from vision_ft_tpu.models.flux.denoiser import Denoiser
from vision_ft_tpu.nn import flatten_params, unflatten_params

TINY = dict(
    type="flux1-dev",
    in_channels=16,  # vae_channels(4) * p^2
    out_channels=16,
    vec_in_dim=24,
    context_in_dim=32,
    hidden_size=48,
    mlp_ratio=2.0,
    num_heads=2,
    depth=1,
    depth_single_blocks=2,
    axes_dim=[8, 8, 8],
    patch_size=2,
    vae_channels=4,
    guidance_embed=True,
    use_flash_attention=False,
)


def _torch_ref():
    import functools

    import torch

    ref_mod = import_reference("src.models.flux.denoiser")
    ref_cfg = import_reference("src.models.flux.config")
    attention = import_reference("src.modules.attention")
    ref_mod.scaled_qkv_attention = functools.partial(
        attention.scaled_qkv_attention, attention_dtype=torch.float32
    )
    torch.manual_seed(0)
    config = ref_cfg.DenoiserConfig(**TINY)
    model = ref_mod.Denoiser(config).eval()
    return torch, model


def test_state_dict_keys_match():
    torch, ref = _torch_ref()
    ref_keys = set(ref.state_dict().keys())
    ours = Denoiser(DenoiserConfig(**TINY))
    our_keys = set(flatten_params(ours.init(jax.random.PRNGKey(0))).keys())
    assert our_keys == ref_keys


@pytest.mark.parametrize("guidance", [None, 3.5, 0.0])
def test_forward_parity(guidance):
    torch, ref = _torch_ref()
    ours = Denoiser(DenoiserConfig(**TINY))
    params = unflatten_params(
        {k: jnp.asarray(v.detach().numpy()) for k, v in ref.state_dict().items()}
    )

    rng = np.random.default_rng(0)
    latent = rng.standard_normal((2, 4, 8, 8), np.float32)
    t5 = rng.standard_normal((2, 6, 32), np.float32)
    clip = rng.standard_normal((2, 24), np.float32)
    t = np.array([0.5, 0.9], np.float32)
    g = None if guidance is None else np.full((2,), guidance, np.float32)

    with torch.no_grad():
        expected = ref(
            latent=torch.from_numpy(latent),
            t5_hidden_states=torch.from_numpy(t5),
            timesteps=torch.from_numpy(t),
            clip_hidden_states=torch.from_numpy(clip),
            guidance=None if g is None else torch.from_numpy(g),
        ).numpy()
    got = ours(
        params,
        jnp.asarray(latent.transpose(0, 2, 3, 1)),
        jnp.asarray(t5),
        jnp.asarray(t),
        jnp.asarray(clip),
        guidance=None if g is None else jnp.asarray(g),
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), expected, atol=3e-4, rtol=3e-4
    )


def test_t5_classic_parity_vs_transformers():
    import torch
    from transformers import T5Config as HFConfig
    from transformers.models.t5.modeling_t5 import T5EncoderModel as HFModel

    from vision_ft_tpu.models.text_encoders.umt5 import UMT5Config, UMT5EncoderModel

    small = dict(
        vocab_size=128, d_model=32, d_kv=8, d_ff=48, num_layers=3, num_heads=4,
        relative_attention_num_buckets=8, relative_attention_max_distance=16,
    )
    torch.manual_seed(0)
    hf = HFModel(
        HFConfig(**small, dense_act_fn="gelu_new", is_gated_act=True,
                 feed_forward_proj="gated-gelu", use_cache=False)
    ).eval()
    ours = UMT5EncoderModel(UMT5Config(**small, per_layer_relative_bias=False))
    flat = {k: jnp.asarray(v.detach().numpy()) for k, v in hf.state_dict().items()}
    our_keys = set(flatten_params(ours.init(jax.random.PRNGKey(0))).keys())
    assert our_keys == set(flat.keys())  # bias only on block 0
    params = unflatten_params(flat)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 128, (2, 9))
    mask = np.ones((2, 9), np.int64)
    mask[1, 6:] = 0
    with torch.no_grad():
        expected = hf(
            input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)
        ).last_hidden_state.numpy()
    got = np.asarray(ours(params, jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_allclose(got[0], expected[0], atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(got[1, :6], expected[1, :6], atol=2e-4, rtol=2e-4)


def _tiny_model():
    """Full tiny FluxModel (MMDiT + CLIP + UMT5 + KL-VAE) on random
    weights — shared by the pipeline e2e test and the continuous-batching
    adapter tests."""
    from vision_ft_tpu.models.autoencoder import AutoencoderKLConfig
    from vision_ft_tpu.models.flux.pipeline import FluxModel
    from vision_ft_tpu.models.text_encoders.clip import CLIPTextConfig
    from vision_ft_tpu.models.text_encoders.umt5 import UMT5Config

    class ClipTok:
        bos_token_id = 0
        eos_token_id = 999
        pad_token_id = 999

        def __call__(self, prompts, max_length=None, **kw):
            rows = []
            for p in prompts:
                ids = [3 + (hash(w) % 900) for w in p.split()][: max_length - 2]
                row = [0, *ids, 999]
                row += [999] * (max_length - len(row))
                rows.append(row)
            return np.asarray(rows, np.int32)

    class T5Tok:
        def __call__(self, prompts, max_length=None, **kw):
            ids, mask = [], []
            for p in prompts:
                t = [3 + (hash(w) % 120) for w in p.split()][:max_length]
                pad = max_length - len(t)
                ids.append(t + [0] * pad)
                mask.append([1] * len(t) + [0] * pad)
            return {"input_ids": ids, "attention_mask": mask}

    config = FluxConfig(
        checkpoint_path="unused", dtype="float32",
        denoiser=dict(TINY, vec_in_dim=48),
    )
    return FluxModel(
        config,
        clip_tokenizer=ClipTok(), t5_tokenizer=T5Tok(),
        vae_config=AutoencoderKLConfig(
            block_out_channels=(8, 8, 16, 16), latent_channels=4, norm_num_groups=4,
            use_quant_conv=False, scaling_factor=0.3611, shift_factor=0.1159,
        ),
        clip_config=CLIPTextConfig(
            vocab_size=1000, hidden_size=48, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4, hidden_act="quick_gelu",
        ),
        t5_config=UMT5Config(
            vocab_size=128, d_model=32, d_kv=8, d_ff=48, num_layers=2, num_heads=4,
            relative_attention_num_buckets=8, relative_attention_max_distance=16,
            per_layer_relative_bias=False,
        ),
    )


def test_generate_end_to_end(tmp_path):
    model = _tiny_model()
    model.init_params(jax.random.PRNGKey(0))
    images = model.generate(
        "a cat", width=32, height=32, num_inference_steps=2, cfg_scale=2.0,
        distilled_guidance_scale=3.5, max_token_length=8, seed=3,
    )
    assert len(images) == 1 and images[0].size == (32, 32)

    # deep_cache_interval=1 refreshes every step -> bit-exact vs plain
    images_dc = model.generate(
        "a cat", width=32, height=32, num_inference_steps=2, cfg_scale=2.0,
        distilled_guidance_scale=3.5, max_token_length=8, seed=3,
        deep_cache_interval=1,
    )
    np.testing.assert_array_equal(np.asarray(images_dc[0]), np.asarray(images[0]))
    # interval 2 reuses the cached delta and still decodes a valid image
    images_dc2 = model.generate(
        "a cat", width=32, height=32, num_inference_steps=2, cfg_scale=2.0,
        distilled_guidance_scale=3.5, max_token_length=8, seed=3,
        deep_cache_interval=2,
    )
    assert images_dc2[0].size == (32, 32)

    # original-key round trip
    sd = model.state_dict()
    assert any(k.startswith("model.diffusion_model.") for k in sd)
    assert any(k.startswith("text_encoders.t5xxl.transformer.") for k in sd)
    assert any(k.startswith("text_encoders.clip_l.transformer.") for k in sd)
    from vision_ft_tpu.utils import safetensors as st

    path = str(tmp_path / "flux.safetensors")
    st.save_file(sd, path)
    model.config = FluxConfig(checkpoint_path=path, dtype="float32",
                              denoiser=dict(TINY, vec_in_dim=48))
    model.load_checkpoint_weights()  # must round-trip without key errors
    images2 = model.generate(
        "a cat", width=32, height=32, num_inference_steps=2, cfg_scale=2.0,
        distilled_guidance_scale=3.5, max_token_length=8, seed=3,
    )
    np.testing.assert_allclose(
        np.asarray(images2[0], np.float32), np.asarray(images[0], np.float32), atol=1
    )


def test_deepcache_forward():
    """Delta-cached Flux forward: refresh pass is bit-identical to the plain
    forward; a cached pass on the SAME inputs reconstructs it to rounding;
    the cached program really skips the deep single blocks (a NaN planted
    in the deepest single block's params poisons refresh but not cached)."""
    from vision_ft_tpu.nn import flatten_params, unflatten_params

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
    t5 = jnp.asarray(rng.standard_normal((2, 6, 32), np.float32))
    clip = jnp.asarray(rng.standard_normal((2, 24), np.float32))
    t = jnp.asarray([0.5, 0.9], jnp.float32)
    g = jnp.full((2,), 3.5, jnp.float32)
    args = (latent, t5, t, clip)

    plain = ours(params, *args, guidance=g)
    full, delta = ours.deepcache_forward(params, *args, guidance=g, refresh=True)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(plain))

    cached, delta2 = ours.deepcache_forward(
        params, *args, guidance=g, cached_delta=delta, refresh=False
    )
    np.testing.assert_allclose(np.asarray(cached), np.asarray(plain),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(delta2), np.asarray(delta))

    # poison the deepest single block: refresh sees it, cached does not
    bad = jax.tree_util.tree_map(lambda x: x, params)
    deepest = str(len(ours.single_blocks) - 1)
    bad["single_blocks"][deepest] = jax.tree_util.tree_map(
        lambda x: jnp.full_like(x, jnp.nan), bad["single_blocks"][deepest]
    )
    poisoned, _ = ours.deepcache_forward(bad, *args, guidance=g, refresh=True)
    assert not np.isfinite(np.asarray(poisoned)).all()
    clean, _ = ours.deepcache_forward(
        bad, *args, guidance=g, cached_delta=delta, refresh=False
    )
    assert np.isfinite(np.asarray(clean)).all()
