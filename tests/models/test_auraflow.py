"""AuraFlow parity vs the torch reference + UMT5 parity vs transformers +
scheduler table + tiny end-to-end generate."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tests")
from reference_loader import import_reference

from vision_ft_tpu.models.auraflow.config import AuraFlowConig, DenoiserConfig
from vision_ft_tpu.models.auraflow.denoiser import Denoiser
from vision_ft_tpu.models.auraflow.scheduler import Scheduler
from vision_ft_tpu.nn import flatten_params, unflatten_params

TINY = dict(
    in_channels=4,
    out_channels=4,
    patch_size=2,
    caption_projection_dim=64,  # == inner_dim
    num_double_layers=1,
    num_single_layers=2,
    num_attention_heads=2,
    attention_head_dim=32,
    joint_attention_dim=48,
    pos_embed_max_size=16 * 16,
    num_register_tokens=2,
    use_flash_attn=False,
)


def _torch_ref(config_kwargs):
    import functools

    import torch

    ref_mod = import_reference("src.models.auraflow.denoiser")
    ref_config = import_reference("src.models.auraflow.config")
    # pin fp32 attention (the reference downcasts fp32->bf16; see
    # src/modules/attention.py:65-70)
    orig = import_reference("src.modules.attention").scaled_qkv_attention
    ref_mod.scaled_qkv_attention = functools.partial(orig, attention_dtype=torch.float32)
    torch.manual_seed(0)
    config = ref_config.DenoiserConfig(**config_kwargs)
    model = ref_mod.Denoiser(config).eval()
    return torch, model


def _copy_weights(torch_model):
    flat = {
        k: jnp.asarray(v.detach().numpy())
        for k, v in torch_model.state_dict().items()
    }
    return unflatten_params(flat)


def test_state_dict_keys_match():
    torch, ref = _torch_ref(TINY)
    ref_keys = set(ref.state_dict().keys())
    ours = Denoiser(DenoiserConfig(**TINY))
    our_keys = set(flatten_params(ours.init(jax.random.PRNGKey(0))).keys())
    assert our_keys == ref_keys


def test_forward_parity_learned_pe():
    torch, ref = _torch_ref(TINY)
    ours = Denoiser(DenoiserConfig(**TINY))
    params = _copy_weights(ref)

    rng = np.random.default_rng(0)
    latent = rng.standard_normal((2, 4, 16, 16), np.float32)  # NCHW for torch
    text = rng.standard_normal((2, 10, 48), np.float32)
    t = np.array([0.5, 0.25], np.float32)

    with torch.no_grad():
        expected = ref(
            latent=torch.from_numpy(latent),
            encoder_hidden_states=torch.from_numpy(text),
            timestep=torch.from_numpy(t),
        ).numpy()

    got = ours(
        params,
        jnp.asarray(latent.transpose(0, 2, 3, 1)),  # NHWC
        jnp.asarray(text),
        jnp.asarray(t),
    )
    got_nchw = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got_nchw, expected, atol=2e-4, rtol=2e-4)


def test_forward_parity_rope_shortcut_guidance():
    cfg = dict(TINY, use_rope=True, rope_dim_sizes=[8, 12, 12],
               use_shortcut=True, use_guidance=True)
    torch, ref = _torch_ref(cfg)
    ours = Denoiser(DenoiserConfig(**cfg))
    params = _copy_weights(ref)
    assert set(flatten_params(params).keys()) == set(
        flatten_params(ours.init(jax.random.PRNGKey(0))).keys()
    )

    rng = np.random.default_rng(1)
    latent = rng.standard_normal((1, 4, 8, 8), np.float32)
    text = rng.standard_normal((1, 6, 48), np.float32)
    t = np.array([0.7], np.float32)
    dur = np.array([0.125], np.float32)

    with torch.no_grad():
        expected = ref(
            latent=torch.from_numpy(latent),
            encoder_hidden_states=torch.from_numpy(text),
            timestep=torch.from_numpy(t),
            shortcut_duration=torch.from_numpy(dur),
            guidance_scale=3.5,
        ).numpy()
    got = ours(
        params,
        jnp.asarray(latent.transpose(0, 2, 3, 1)),
        jnp.asarray(text),
        jnp.asarray(t),
        shortcut_duration=jnp.asarray(dur),
        guidance_scale=3.5,
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), expected, atol=5e-4, rtol=5e-4
    )


def test_scheduler_tables():
    # independent recompute of the diffusers FlowMatchEuler recipe
    shift = 1.73
    s = Scheduler(shift=shift)
    base = np.arange(1000, 0, -1, dtype=np.float64) / 1000
    shifted = shift * base / (1 + (shift - 1) * base)
    assert s.sigma_max == pytest.approx(shifted[0])
    assert s.sigma_min == pytest.approx(shifted[-1])

    s.set_timesteps(8)
    ts = np.linspace(1000 * shifted[0], 1000 * shifted[-1], 8)
    sig = shift * (ts / 1000) / (1 + (shift - 1) * (ts / 1000))
    np.testing.assert_allclose(s.sigmas[:-1], sig, rtol=1e-12)
    assert s.sigmas[-1] == 0.0
    np.testing.assert_allclose(s.timesteps, sig * 1000, rtol=1e-12)
    # euler step
    x = np.ones((2, 2))
    out = s.step(np.full((2, 2), 2.0), 0, x)
    np.testing.assert_allclose(out, x + (s.sigmas[1] - s.sigmas[0]) * 2.0)


def test_umt5_parity_vs_transformers():
    import torch
    from transformers import UMT5Config as HFConfig
    from transformers.models.umt5.modeling_umt5 import UMT5EncoderModel as HFModel

    from vision_ft_tpu.models.text_encoders.umt5 import UMT5Config, UMT5EncoderModel

    small = dict(
        vocab_size=128, d_model=32, d_kv=8, d_ff=48, num_layers=2, num_heads=4,
        relative_attention_num_buckets=8, relative_attention_max_distance=16,
    )
    torch.manual_seed(0)
    hf = HFModel(
        HFConfig(**small, dense_act_fn="gelu_new", is_gated_act=True,
                 feed_forward_proj="gated-gelu", use_cache=False)
    ).eval()
    ours = UMT5EncoderModel(UMT5Config(**small))
    flat = {k: jnp.asarray(v.detach().numpy()) for k, v in hf.state_dict().items()}
    ref_keys = set(flat.keys())
    our_keys = set(flatten_params(ours.init(jax.random.PRNGKey(0))).keys())
    assert our_keys == ref_keys
    params = unflatten_params(flat)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 128, (2, 12))
    mask = np.ones((2, 12), np.int64)
    mask[1, 8:] = 0
    with torch.no_grad():
        expected = hf(
            input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)
        ).last_hidden_state.numpy()
    got = np.asarray(ours(params, jnp.asarray(ids), jnp.asarray(mask)))
    # positions masked out may differ (torch computes them w/ mask too) —
    # compare only valid positions
    np.testing.assert_allclose(got[0], expected[0], atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(got[1, :8], expected[1, :8], atol=2e-4, rtol=2e-4)


class _Tok:
    def __call__(self, prompts, max_length=None, **kw):
        ids, mask = [], []
        for p in prompts:
            t = [3 + (hash(w) % 120) for w in p.split()][:max_length]
            pad = max_length - len(t)
            ids.append(t + [0] * pad)
            mask.append([1] * len(t) + [0] * pad)
        return {"input_ids": ids, "attention_mask": mask}


def _tiny_model(checkpoint_path: str = "unused"):
    """Full tiny AuraFlow pipeline (denoiser + UMT5 + KL VAE); shared with
    the continuous-batching suite."""
    from vision_ft_tpu.models.auraflow.pipeline import AuraFlowModel
    from vision_ft_tpu.models.autoencoder import AutoencoderKLConfig
    from vision_ft_tpu.models.text_encoders.umt5 import UMT5Config

    config = AuraFlowConig(checkpoint_path=checkpoint_path, dtype="float32",
                           denoiser=DenoiserConfig(**TINY))
    return AuraFlowModel(
        config,
        tokenizer=_Tok(),
        vae_config=AutoencoderKLConfig(
            block_out_channels=(8, 8, 16, 16), latent_channels=4, norm_num_groups=4
        ),
        text_encoder_config=UMT5Config(
            vocab_size=128, d_model=48, d_kv=8, d_ff=64, num_layers=2, num_heads=4,
            relative_attention_num_buckets=8, relative_attention_max_distance=16,
        ),
    )


def test_generate_end_to_end(tmp_path):
    from vision_ft_tpu.models.auraflow.pipeline import AuraFlowModel
    from vision_ft_tpu.models.autoencoder import AutoencoderKLConfig
    from vision_ft_tpu.models.text_encoders.umt5 import UMT5Config

    Tok = _Tok
    config = AuraFlowConig(checkpoint_path="unused", dtype="float32",
                           denoiser=DenoiserConfig(**TINY))
    model = _tiny_model()
    model.init_params(jax.random.PRNGKey(0))
    images = model.generate(
        "a cat", width=32, height=32, num_inference_steps=2, cfg_scale=1.5,
        max_token_length=8, seed=42,
    )
    assert len(images) == 1 and images[0].size == (32, 32)

    # deep_cache_interval=1 refreshes every step -> bit-exact vs plain
    images_dc = model.generate(
        "a cat", width=32, height=32, num_inference_steps=2, cfg_scale=1.5,
        max_token_length=8, seed=42, deep_cache_interval=1,
    )
    np.testing.assert_array_equal(np.asarray(images_dc[0]), np.asarray(images[0]))
    # interval 2 reuses the cached delta and still decodes a valid image
    images_dc2 = model.generate(
        "a cat", width=32, height=32, num_inference_steps=2, cfg_scale=1.5,
        max_token_length=8, seed=42, deep_cache_interval=2,
    )
    assert images_dc2[0].size == (32, 32)

    # checkpoint round trip through the original key layout
    sd = model.state_dict()
    assert any(k.startswith("model.") for k in sd)
    assert any(k.startswith("text_encoders.pile_t5xl.transformer.") for k in sd)
    from vision_ft_tpu.utils import safetensors as st

    path = str(tmp_path / "auraflow.safetensors")
    st.save_file(sd, path)
    model2 = AuraFlowModel(
        config, tokenizer=Tok(),
        vae_config=AutoencoderKLConfig(
            block_out_channels=(8, 8, 16, 16), latent_channels=4, norm_num_groups=4
        ),
        text_encoder_config=UMT5Config(
            vocab_size=128, d_model=48, d_kv=8, d_ff=64, num_layers=2, num_heads=4,
            relative_attention_num_buckets=8, relative_attention_max_distance=16,
        ),
    )
    model2.config = AuraFlowConig(checkpoint_path=path, dtype="float32",
                                  denoiser=DenoiserConfig(**TINY))
    model2._load_original_weights()
    images2 = model2.generate(
        "a cat", width=32, height=32, num_inference_steps=2, cfg_scale=1.5,
        max_token_length=8, seed=42,
    )
    np.testing.assert_allclose(
        np.asarray(images2[0], np.float32), np.asarray(images[0], np.float32), atol=1
    )


def test_deepcache_forward():
    """Delta-cached MMDiT forward: refresh pass is bit-identical to the
    plain forward; a cached pass on the SAME inputs reconstructs it to
    rounding; the cached program really skips the deep single layers (a
    NaN planted in the deepest single layer's params poisons refresh but
    not cached)."""
    ours = Denoiser(DenoiserConfig(**TINY))
    params = ours.init(jax.random.PRNGKey(1))
    # final_linear/cond_seq_linear are zero-init (reference parity);
    # randomize them so outputs actually depend on the stack
    params["final_linear"]["weight"] = (
        jax.random.normal(jax.random.PRNGKey(2),
                          params["final_linear"]["weight"].shape) * 0.05
    )
    params["cond_seq_linear"]["weight"] = (
        jax.random.normal(jax.random.PRNGKey(3),
                          params["cond_seq_linear"]["weight"].shape) * 0.05
    )
    rng = np.random.default_rng(2)
    latent = jnp.asarray(rng.standard_normal((2, 16, 16, 4), np.float32))
    text = jnp.asarray(rng.standard_normal((2, 6, 48), np.float32))
    t = jnp.asarray([0.3, 0.8], jnp.float32)

    plain = ours(params, latent, text, t)
    full, delta = ours.deepcache_forward(params, latent, text, t, refresh=True)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(plain))

    cached, delta2 = ours.deepcache_forward(
        params, latent, text, t, cached_delta=delta, refresh=False
    )
    np.testing.assert_allclose(np.asarray(cached), np.asarray(plain),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(delta2), np.asarray(delta))

    # poison the deepest single layer: refresh sees it, cached does not
    bad = jax.tree_util.tree_map(lambda x: x, params)
    deepest = str(len(ours.single_layers) - 1)
    bad["single_layers"][deepest] = jax.tree_util.tree_map(
        lambda x: jnp.full_like(x, jnp.nan), bad["single_layers"][deepest]
    )
    poisoned, _ = ours.deepcache_forward(bad, latent, text, t, refresh=True)
    assert not np.isfinite(np.asarray(poisoned)).all()
    clean, _ = ours.deepcache_forward(
        bad, latent, text, t, cached_delta=delta, refresh=False
    )
    assert np.isfinite(np.asarray(clean)).all()


def test_remat_group_grad_equality():
    """Grouped remat (nn.core.set_remat_group) is a memory knob, not a
    math change: grads of a LoRA-style loss through the double+single
    stacks are identical for group sizes 1, 2 (uneven 2+1 chunking of 3
    single layers), and no-checkpointing."""
    from vision_ft_tpu.nn.core import set_remat_group

    cfg = dict(TINY, num_single_layers=3)
    ours = Denoiser(DenoiserConfig(**cfg))
    params = ours.init(jax.random.PRNGKey(1), jnp.float32)
    params["final_linear"]["weight"] = (
        jax.random.normal(jax.random.PRNGKey(2),
                          params["final_linear"]["weight"].shape) * 0.05
    )
    rng = np.random.default_rng(5)
    latent = jnp.asarray(rng.standard_normal((2, 16, 16, 4), np.float32))
    text = jnp.asarray(rng.standard_normal((2, 6, 48), np.float32))
    t = jnp.asarray([0.3, 0.8], jnp.float32)

    def loss(p):
        return jnp.sum(ours(p, latent, text, t) ** 2)

    def grads():
        # re-trace each call: remat_group is a trace-time global
        return jax.grad(loss)(params)

    ours.set_gradient_checkpointing(False)
    base = grads()
    try:
        ours.set_gradient_checkpointing(True)
        g1 = grads()
        set_remat_group(2)
        g2 = grads()
        set_remat_group(5)  # > stack depth: one chunk per stack
        g5 = grads()
    finally:
        set_remat_group(1)
        ours.set_gradient_checkpointing(False)

    for got in (g1, g2, g5):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5
            ),
            base, got,
        )
