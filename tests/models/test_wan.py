"""Wan 2.2 parity vs torch reference (denoiser, T5 text encoder, scheduler)
plus pipeline e2e with a toy VAE."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tests")
from reference_loader import import_reference

from vision_ft_tpu.models.wan.config import DenoiserConfig, WanConfig
from vision_ft_tpu.models.wan.denoiser import Denoiser
from vision_ft_tpu.models.wan.text_encoder import TextEncoder, TextEncoderConfig
from vision_ft_tpu.nn import flatten_params, unflatten_params

TINY = dict(
    type="ti2v",
    in_channels=8,
    out_channels=8,
    hidden_dim=64,
    ffn_dim=128,
    freq_dim=32,
    text_dim=24,
    num_heads=4,
    num_layers=2,
    text_length=16,
    patch_size=(1, 2, 2),
)

TINY_T5 = dict(
    vocab_size=64,
    dim=32,
    dim_attn=32,
    dim_ffn=48,
    num_heads=4,
    num_layers=2,
    num_buckets=8,
    shared_pos=False,
    dropout=0.0,
)


def _fake_flash_attention(
    q, k, v, q_lens=None, k_lens=None, dropout_p=0.0, softmax_scale=None,
    q_scale=None, causal=False, window_size=(-1, -1), deterministic=False,
    dtype=None, version=None,
):
    """CPU stand-in for the reference's CUDA-only varlen flash attention
    (reference denoiser.py:107-219): plain SDPA with a key-length mask."""
    import torch

    scale = softmax_scale if softmax_scale is not None else q.shape[-1] ** -0.5
    if q_scale is not None:
        q = q * q_scale
    qq, kk, vv = (t.transpose(1, 2).double() for t in (q, k, v))
    logits = qq @ kk.transpose(-1, -2) * scale
    if k_lens is not None:
        mask = torch.arange(k.shape[1])[None, :] < k_lens[:, None]
        logits = logits.masked_fill(~mask[:, None, None, :], float("-inf"))
    out = logits.softmax(-1) @ vv
    return out.transpose(1, 2).to(q.dtype)


def _torch_ref():
    import torch

    ref_mod = import_reference("src.models.wan.denoiser")
    ref_cfg = import_reference("src.models.wan.config")
    ref_mod.flash_attention = _fake_flash_attention
    torch.manual_seed(0)
    model = ref_mod.Denoiser(ref_cfg.DenoiserConfig(**TINY)).eval()
    return torch, model


def _inputs(rng):
    latents = rng.standard_normal((2, 8, 2, 4, 4), np.float32)  # (B, C, F, H, W)
    ctx_lens = [5, 3]
    context = np.zeros((2, 5, 24), np.float32)
    for i, ln in enumerate(ctx_lens):
        context[i, :ln] = rng.standard_normal((ln, 24), np.float32)
    return latents, context, ctx_lens


def test_state_dict_keys_match():
    torch, ref = _torch_ref()
    ours = Denoiser(DenoiserConfig(**TINY))
    our_keys = set(flatten_params(ours.init(jax.random.PRNGKey(0))).keys())
    assert our_keys == set(ref.state_dict().keys())


@pytest.mark.parametrize("per_token_t", [False, True])
def test_forward_parity(per_token_t):
    torch, ref = _torch_ref()
    ours = Denoiser(DenoiserConfig(**TINY))
    params = unflatten_params(
        {k: jnp.asarray(v.detach().numpy()) for k, v in ref.state_dict().items()}
    )

    rng = np.random.default_rng(0)
    latents, context, ctx_lens = _inputs(rng)
    seq = 2 * 2 * 2  # grid (2, 2, 2) with patch (1, 2, 2)
    if per_token_t:
        t = rng.uniform(0, 1000, (2, seq)).astype(np.float32)
    else:
        t = np.array([500.0, 100.0], np.float32)

    with torch.no_grad():
        expected = ref(
            latents=[torch.from_numpy(x) for x in latents],
            timesteps=torch.from_numpy(t),
            context=[
                torch.from_numpy(context[i, :ln]) for i, ln in enumerate(ctx_lens)
            ],
            seq_len=seq,
        )
        expected = torch.stack(list(expected.unbind(0))).numpy()

    got = ours(
        params,
        jnp.asarray(latents.transpose(0, 2, 3, 4, 1)),  # NCFHW -> NFHWC
        jnp.asarray(t),
        jnp.asarray(context),
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 4, 1, 2, 3), expected, atol=5e-4, rtol=5e-4
    )


def test_text_encoder_parity():
    import torch

    ref_mod = import_reference("src.models.wan.text_encoder")
    torch.manual_seed(0)
    ref = ref_mod.T5Encoder(**TINY_T5).eval()

    ours = TextEncoder(TextEncoderConfig(**TINY_T5))
    flat = {
        f"model.{k}": jnp.asarray(v.detach().numpy()) for k, v in ref.state_dict().items()
    }
    assert set(flat.keys()) == set(
        flatten_params(ours.init(jax.random.PRNGKey(0))).keys()
    )
    params = unflatten_params(flat)

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 64, (2, 10))
    mask = np.ones((2, 10), np.int64)
    mask[0, 7:] = 0
    mask[1, 4:] = 0

    with torch.no_grad():
        expected = ref(
            torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)
        ).numpy()
    got = ours.encode_tokens(params, jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), expected, atol=3e-5, rtol=3e-5)


def test_scheduler_parity():
    from vision_ft_tpu.models.wan.scheduler import Scheduler

    ref_mod = import_reference("src.models.wan.scheduler")
    ref, ours = ref_mod.Scheduler(), Scheduler()
    np.testing.assert_allclose(ref.get_timesteps(25), ours.get_timesteps(25))
    np.testing.assert_allclose(ref.get_sigmas(25), ours.get_sigmas(25))


def test_key_converters_match_reference():
    from vision_ft_tpu.models.wan import util as ours

    ref = import_reference("src.models.wan.util")
    for key in ("blocks.0.self_attn.q.weight", "model.blocks.0.self_attn.q.weight",
                "token_embedding.weight", "model.token_embedding.weight"):
        for module in ("text_encoder", "denoiser", "vae"):
            assert ours.convert_from_original_key(key, module) == \
                ref.convert_from_original_key(key, module)
            assert ours.convert_to_original_key(key, module) == \
                ref.convert_to_original_key(key, module)


class _ToyVAE:
    """Shape-correct stand-in (real Wan VAE is external in the reference too)."""

    temporal_compression_ratio = 4
    spatial_compression_ratio = 16
    latent_dim = 48

    def normalize_latents(self, raw):
        return raw

    def denormalize_latents(self, latents):
        return latents

    def encode(self, video):
        b, f, h, w, _ = video.shape
        fl = (f - 1) // 4 + 1
        return jnp.zeros((b, fl, h // 16, w // 16, 48), video.dtype)

    def decode(self, latents):
        b, fl, hl, wl, c = latents.shape
        video = jnp.repeat(jnp.repeat(latents[..., :3], 16, axis=2), 16, axis=3)
        return jnp.tanh(jnp.repeat(video, 4, axis=1))


class _Tok:
    pad_token_id = 0

    def __call__(self, prompts, max_length=None, **kw):
        ids, longest = [], max(max(len(p.split()), 1) for p in prompts)
        for p in prompts:
            t = [3 + (hash(w) % 60) for w in p.split()][:max_length]
            ids.append(t + [0] * (longest - len(t)))
        return {"input_ids": ids}


def test_generate_end_to_end(tmp_path):
    from vision_ft_tpu.models.wan.pipeline import Wan22
    from vision_ft_tpu.utils import safetensors as st

    config = WanConfig(
        denoiser_path=str(tmp_path / "denoiser.safetensors"),
        text_encoder_path=str(tmp_path / "te.safetensors"),
        vae_path=str(tmp_path / "vae.safetensors"),
        dtype="float32",
        # the tiny denoiser runs on 48ch latents to match the toy VAE;
        # text_dim matches the tiny T5's hidden dim
        denoiser=DenoiserConfig(
            **{**TINY, "in_channels": 48, "out_channels": 48, "text_dim": 32},
            vae_channels=48,
        ),
    )

    model = Wan22(
        config, tokenizer=_Tok(),
        text_encoder_config=TextEncoderConfig(**TINY_T5), vae=_ToyVAE(),
    )
    model.init_params(jax.random.PRNGKey(0))
    videos = model.generate(
        "a cat running", frames=4, width=32, height=32,
        num_inference_steps=2, cfg_scale=5.0, seed=0,
    )
    assert len(videos) == 1
    assert len(videos[0]) == 4 and videos[0][0].size == (32, 32)

    # deep_cache_interval=1 refreshes every step -> bit-exact vs plain
    videos_dc = model.generate(
        "a cat running", frames=4, width=32, height=32,
        num_inference_steps=2, cfg_scale=5.0, seed=0, deep_cache_interval=1,
    )
    np.testing.assert_array_equal(
        np.asarray(videos_dc[0][0]), np.asarray(videos[0][0])
    )
    # interval 2 reuses the cached delta and still decodes valid frames
    videos_dc2 = model.generate(
        "a cat running", frames=4, width=32, height=32,
        num_inference_steps=2, cfg_scale=5.0, seed=0, deep_cache_interval=2,
    )
    assert len(videos_dc2[0]) == 4

    # three-file checkpoint round trip through the reference key layout
    st.save_file(model.denoiser_state_dict(), config.denoiser_path)
    st.save_file(model.text_encoder_state_dict(), config.text_encoder_path)
    st.save_file({"dummy": jnp.zeros((1,))}, config.vae_path)
    assert all(
        k.startswith("model.") for k in st.load_file(config.denoiser_path)
    )
    assert not any(
        k.startswith("model.") for k in st.load_file(config.text_encoder_path)
    )

    model2 = Wan22(
        config, tokenizer=_Tok(),
        text_encoder_config=TextEncoderConfig(**TINY_T5), vae=_ToyVAE(),
    )
    model2._from_checkpoint()
    videos2 = model2.generate(
        "a cat running", frames=4, width=32, height=32,
        num_inference_steps=2, cfg_scale=5.0, seed=0,
    )
    np.testing.assert_allclose(
        np.asarray(videos2[0][0], np.float32), np.asarray(videos[0][0], np.float32),
        atol=1,
    )


def test_video_writer(tmp_path):
    from PIL import Image

    from vision_ft_tpu.utils.video import write_images_as_video

    frames = [
        Image.fromarray(np.full((16, 16, 3), i * 40, np.uint8)) for i in range(4)
    ]
    path = str(tmp_path / "out.mp4")
    write_images_as_video(frames, path, fps=8)
    import os

    assert os.path.getsize(path) > 0


def test_deepcache_forward():
    """Delta-cached Wan DiT forward: refresh pass is bit-identical to the
    plain forward; a cached pass on the SAME inputs reconstructs it to
    rounding; the cached program really skips the deep blocks (a NaN
    planted in the deepest block's params poisons refresh but not cached)."""
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
    latents = jnp.asarray(rng.standard_normal((2, 2, 8, 8, 8), np.float32))
    t = jnp.asarray([0.4, 0.8], jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((2, 16, 24), np.float32))

    plain = ours(params, latents, t, ctx)
    full, delta = ours.deepcache_forward(params, latents, t, ctx, refresh=True)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(plain))

    cached, delta2 = ours.deepcache_forward(
        params, latents, t, ctx, cached_delta=delta, refresh=False
    )
    np.testing.assert_allclose(np.asarray(cached), np.asarray(plain),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(delta2), np.asarray(delta))

    # poison the deepest block: refresh sees it, cached does not
    bad = jax.tree_util.tree_map(lambda x: x, params)
    deepest = str(len(ours.blocks) - 1)
    bad["blocks"][deepest] = jax.tree_util.tree_map(
        lambda x: jnp.full_like(x, jnp.nan), bad["blocks"][deepest]
    )
    poisoned, _ = ours.deepcache_forward(bad, latents, t, ctx, refresh=True)
    assert not np.isfinite(np.asarray(poisoned)).all()
    clean, _ = ours.deepcache_forward(
        bad, latents, t, ctx, cached_delta=delta, refresh=False
    )
    assert np.isfinite(np.asarray(clean)).all()
