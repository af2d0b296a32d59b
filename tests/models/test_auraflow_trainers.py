"""AuraFlow shortcut / RoPE-migration / VAE-migration trainers."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tests")
from reference_loader import import_reference

from vision_ft_tpu.models.auraflow.config import AuraFlowConig, DenoiserConfig
from vision_ft_tpu.models.auraflow.denoiser import Denoiser

TINY = dict(
    in_channels=4,
    out_channels=4,
    patch_size=2,
    caption_projection_dim=64,
    num_double_layers=1,
    num_single_layers=2,
    num_attention_heads=2,
    attention_head_dim=32,
    joint_attention_dim=48,
    pos_embed_max_size=16 * 16,
    num_register_tokens=2,
    use_flash_attn=False,
)
ROPE = dict(use_rope=True, rope_dim_sizes=[8, 12, 12], rope_theta=10000.0)


def test_self_consistency_targets_match_reference():
    """Same deterministic 'denoiser' + same inputs -> identical targets."""
    import torch

    ref = import_reference("src.modules.loss.shortcut")
    from vision_ft_tpu.modules.loss.shortcut import (
        get_shortcut_target_velocity,
        prepare_self_consistency_targets,
    )

    rng = np.random.default_rng(0)
    latents = rng.standard_normal((2, 4, 8, 8), np.float32)
    hidden = rng.standard_normal((2, 6, 48), np.float32)
    t = np.array([0.75, 0.5], np.float32)
    dur = np.array([0.5, 0.25], np.float32)

    def torch_denoiser(latent, encoder_hidden_states, timestep, shortcut_duration):
        return latent * 0.1 + timestep[:, None, None, None] - shortcut_duration[
            :, None, None, None
        ]

    first_t, second_t = ref.prepare_self_consistency_targets(
        denoiser=torch_denoiser,
        latents=torch.from_numpy(latents),
        encoder_hidden_states=torch.from_numpy(hidden),
        departure_timesteps=torch.from_numpy(t),
        double_shortcut_duration=torch.from_numpy(dur),
        cfg_scale=2.0,
    )
    expected = ref.get_shortcut_target_velocity(first_t, second_t).numpy()

    def jax_denoise(lat, timestep, duration):
        return lat * 0.1 + timestep[:, None, None, None] - duration[:, None, None, None]

    first, second = prepare_self_consistency_targets(
        jax_denoise, jnp.asarray(latents), jnp.asarray(t), jnp.asarray(dur),
        cfg_scale=2.0,
    )
    got = np.asarray(get_shortcut_target_velocity(first, second))
    np.testing.assert_allclose(got, expected, atol=1e-6, rtol=1e-6)


def test_shortcut_duration_sampling_properties():
    from vision_ft_tpu.modules.loss.shortcut import prepare_random_shortcut_durations

    out = prepare_random_shortcut_durations(
        jax.random.PRNGKey(0), 512, min_pow=0, max_pow=7
    )
    steps = np.asarray(out.inference_steps)
    dur = np.asarray(out.shortcut_duration)
    dep = np.asarray(out.departure_timesteps)
    assert set(np.unique(steps)).issubset({2.0**k for k in range(7)})
    # reference quirk: exponent 0 has sqrt-weight 0, so steps==1 never drawn
    assert 1.0 not in np.unique(steps)
    np.testing.assert_allclose(dur, 1.0 / steps)
    # departure = k/steps for integer k in [1, steps]
    k = dep * steps
    np.testing.assert_allclose(k, np.round(k), atol=1e-5)
    assert (k >= 1).all() and (k <= steps).all()


def test_shortcut_denoiser_zero_embedder_is_noop():
    from vision_ft_tpu.models.auraflow.train_shortcut import DenoiserForShortcut

    base = Denoiser(DenoiserConfig(**TINY))
    base_params = base.init(jax.random.PRNGKey(0))
    sc = DenoiserForShortcut(DenoiserConfig(**TINY))
    sc_params = sc.init(jax.random.PRNGKey(0))
    # share the base weights; zero the embedder
    for k, v in base_params.items():
        sc_params[k] = v
    DenoiserForShortcut.reset_shortcut_params(sc_params)

    rng = np.random.default_rng(0)
    latent = jnp.asarray(rng.standard_normal((1, 8, 8, 4), np.float32))
    hidden = jnp.asarray(rng.standard_normal((1, 6, 48), np.float32))
    t = jnp.array([0.5])
    expected = base(base_params, latent, hidden, t)
    got = sc(sc_params, latent, hidden, t, shortcut_duration=jnp.array([0.25]))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expected))


def test_rope_migration_blend_endpoints():
    """scale=0 -> identical to learned-PE forward; scale=1 -> identical to
    pure-RoPE forward (same weights)."""
    from vision_ft_tpu.models.auraflow.train_rope_migration import (
        DenoiserForRoPEMigration,
    )

    cfg = DenoiserConfig(**TINY, **ROPE)
    mig = DenoiserForRoPEMigration(cfg)
    params = mig.init(jax.random.PRNGKey(0))
    # final/cond projections are zero-initialized by design; randomize them
    # so the outputs actually depend on the positional path
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    params["final_linear"]["weight"] = (
        0.1 * jax.random.normal(k1, params["final_linear"]["weight"].shape)
    )
    params["cond_seq_linear"]["weight"] = (
        0.1 * jax.random.normal(k2, params["cond_seq_linear"]["weight"].shape)
    )
    params["migration_scale"] = {"scale": jnp.zeros((1,))}

    pe_denoiser = Denoiser(DenoiserConfig(**TINY))  # learned PE
    rope_denoiser = Denoiser(cfg)  # pure RoPE

    rng = np.random.default_rng(0)
    latent = jnp.asarray(rng.standard_normal((1, 8, 8, 4), np.float32))
    hidden = jnp.asarray(rng.standard_normal((1, 6, 48), np.float32))
    t = jnp.array([0.5])

    got0 = mig(params, latent, hidden, t)
    expected_pe = pe_denoiser(params, latent, hidden, t)
    np.testing.assert_allclose(
        np.asarray(got0), np.asarray(expected_pe), atol=1e-5, rtol=1e-5
    )

    params["migration_scale"] = {"scale": jnp.ones((1,))}
    got1 = mig(params, latent, hidden, t)
    expected_rope = rope_denoiser(params, latent, hidden, t)
    np.testing.assert_allclose(
        np.asarray(got1), np.asarray(expected_rope), atol=1e-5, rtol=1e-5
    )
    assert np.abs(np.asarray(got1) - np.asarray(got0)).max() > 1e-6


def test_migration_scale_freezing():
    from vision_ft_tpu.modules.migration.scale import MigrationScaleFromZero

    ms = MigrationScaleFromZero(dim=1, freezing_threshold=1e-3)
    live = {"scale": jnp.array([0.5])}
    frozen = {"scale": jnp.array([0.9999])}
    assert float(ms.inner_scale(live)[0]) == pytest.approx(0.5)
    assert float(ms.inner_scale(frozen)[0]) == 1.0
    # gradient flows only while live
    g_live = jax.grad(lambda p: jnp.sum(ms.inner_scale(p)))(live)
    g_frozen = jax.grad(lambda p: jnp.sum(ms.inner_scale(p)))(frozen)
    assert float(g_live["scale"][0]) == 1.0
    assert float(g_frozen["scale"][0]) == 0.0


def test_vae_migration_loss_and_grads():
    from vision_ft_tpu.config import TrainConfig
    from vision_ft_tpu.models.auraflow.train_vae_encode_migration import (
        AuraFlowForVAEEncoderMigrationTraining,
        extend_init_x_linear,
        pad_patches,
    )

    # unit pieces
    lin = {"weight": jnp.ones((8, 16)), "bias": jnp.zeros((8,))}
    ext = extend_init_x_linear(lin, 64)
    assert ext["weight"].shape == (8, 64)
    np.testing.assert_array_equal(np.asarray(ext["weight"][:, :16]), 1.0)
    np.testing.assert_array_equal(np.asarray(ext["weight"][:, 16:]), 0.0)
    padded = pad_patches(jnp.ones((1, 4, 16)), 64)
    assert padded.shape == (1, 4, 64)

    config = TrainConfig.model_validate(
        {
            "model": {
                "checkpoint_path": "", "dtype": "float32",
                "denoiser": dict(TINY),
            },
            "dataset": {"folder": "/nonexistent", "batch_size": 1},
            "optimizer": {"name": "torch.optim.AdamW", "args": {"lr": 1e-2}},
            "saving": {"strategy": {"per_epochs": 1},
                       "callbacks": [{"type": "safetensors", "name": "x",
                                      "save_dir": "/tmp/x"}]},
            "seed": 0, "num_train_epochs": 1,
        }
    )
    workload = AuraFlowForVAEEncoderMigrationTraining.__new__(
        AuraFlowForVAEEncoderMigrationTraining
    )
    workload.config = config
    workload.model_config = workload.model_config_class.model_validate(
        config.model
    )
    workload._is_peft = False
    workload.setup_model()
    workload.sanity_check()

    batch = {"pixel_values": jnp.zeros((1, 64, 64, 3))}
    flat = {
        k: v
        for k, v in __import__("vision_ft_tpu.nn", fromlist=["flatten_params"])
        .flatten_params(workload.get_params())
        .items()
    }
    from vision_ft_tpu.nn import unflatten_params

    trainable = unflatten_params(
        {k: v for k, v in flat.items() if workload.trainable_filter(k)}
    )
    frozen = unflatten_params(
        {k: v for k, v in flat.items() if not workload.trainable_filter(k)}
    )
    (loss, logs), grads = jax.value_and_grad(
        lambda tr: workload.loss_fn(tr, frozen, batch, jax.random.PRNGKey(0)),
        has_aux=True,
    )(trainable)
    assert np.isfinite(float(loss))
    g = grads["migration_scale"]["scale"]
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0
    assert "migration_loss" in logs and "ppl_loss" in logs
    sd = workload.get_state_dict_to_save()
    assert any("init_x_linear" in k for k in sd)
    assert any("migration_scale.scale" in k for k in sd)
