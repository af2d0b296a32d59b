"""Loss + timestep-sampler behavior tests (reference parity at the math level)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_ft_tpu.modules.loss import diffusion, flow_match
from vision_ft_tpu.modules.timestep import sampling
from vision_ft_tpu.modules.timestep.scheduler import get_flux_schedule, get_linear_schedule


def test_ddpm_alphas_cumprod_matches_torch_formula():
    # independently recompute the scaled-linear schedule with numpy
    betas = np.linspace(0.00085**0.5, 0.012**0.5, 1000, dtype=np.float32) ** 2
    expected = np.cumprod(1.0 - betas)
    got = np.asarray(diffusion.get_alphas_cumprod())
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_ddpm_noising_interpolates():
    key = jax.random.PRNGKey(0)
    latents = jnp.ones((2, 4, 4, 4), jnp.float32)
    # t=0: nearly clean; t=999: nearly pure noise
    out0 = diffusion.prepare_noised_latents(key, latents, jnp.array([0, 0]))
    a0 = float(diffusion.get_alphas_cumprod()[0])
    np.testing.assert_allclose(
        np.asarray(out0.noisy_latents),
        np.sqrt(a0) * np.asarray(latents)
        + np.sqrt(1 - a0) * np.asarray(out0.random_noise),
        rtol=1e-4,
        atol=1e-5,
    )
    out999 = diffusion.prepare_noised_latents(key, latents, jnp.array([999, 999]))
    a999 = float(diffusion.get_alphas_cumprod()[999])
    assert a999 < 0.0047  # mostly noise by the end of the schedule
    loss = diffusion.loss_with_predicted_noise(latents, out0.random_noise, out0.random_noise)
    assert float(loss) == 0.0


def test_flow_match_noising_convention():
    key = jax.random.PRNGKey(1)
    latents = jax.random.normal(key, (3, 8, 8, 4))
    noisy_t0 = flow_match.prepare_noised_latents(key, latents, jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(noisy_t0.noisy_latents), np.asarray(latents), atol=1e-6)
    noisy_t1 = flow_match.prepare_noised_latents(key, latents, jnp.ones(3))
    np.testing.assert_allclose(
        np.asarray(noisy_t1.noisy_latents), np.asarray(noisy_t1.random_noise), atol=1e-6
    )
    # target velocity = noise - latents; zero loss when predicted exactly
    v = flow_match.get_flow_match_target_velocity(latents, noisy_t1.random_noise)
    assert float(flow_match.loss_with_predicted_velocity(latents, noisy_t1.random_noise, v)) < 1e-12


def test_scaled_noised_latents_clean_at_zero_flips():
    key = jax.random.PRNGKey(2)
    latents = jax.random.normal(key, (2, 4, 4, 4))
    t = jnp.array([0.0, 0.0])
    clean0 = flow_match.prepare_scaled_noised_latents(key, latents, t, clean_at_zero=True)
    np.testing.assert_allclose(np.asarray(clean0.noisy_latents), np.asarray(latents), atol=1e-6)
    noise0 = flow_match.prepare_scaled_noised_latents(key, latents, t, clean_at_zero=False)
    np.testing.assert_allclose(
        np.asarray(noise0.noisy_latents), np.asarray(noise0.random_noise), atol=1e-6
    )


def test_convert_x0_to_velocity_roundtrip():
    key = jax.random.PRNGKey(3)
    latents = jax.random.normal(key, (2, 4, 4, 4))
    t = jnp.array([0.3, 0.7])
    out = flow_match.prepare_noised_latents(key, latents, t)
    # true velocity from x0 prediction == noise - latents
    v = flow_match.convert_x0_to_velocity(latents, out.noisy_latents, t, clean_at_zero=True)
    expected = np.asarray(out.random_noise) - np.asarray(latents)
    np.testing.assert_allclose(np.asarray(v), expected, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize(
    "name", ["sigmoid", "shift_sigmoid", "flux_shift", "uniform", "scale_shift_sigmoid"]
)
def test_samplers_in_unit_interval(name):
    key = jax.random.PRNGKey(0)
    t = sampling.sample_timestep(key, (64, 16, 16, 4), name)
    assert t.shape == (64,)
    assert float(t.min()) >= 0.0 and float(t.max()) <= 1.0


def test_shift_sigmoid_shifts_up():
    key = jax.random.PRNGKey(0)
    base = sampling.sigmoid_randn(key, (4096, 8, 8, 4))
    shifted = sampling.shift_sigmoid_randn(key, (4096, 8, 8, 4), discrete_flow_shift=3.1825)
    assert float(shifted.mean()) > float(base.mean())  # shift favors high t


def test_fraction_uniform_only_grid_values():
    key = jax.random.PRNGKey(0)
    t = np.asarray(sampling.fraction_uniform_rand(key, (256, 4, 4, 4), divisible=[4, 5]))
    grid = {i / d for d in (4, 5) for i in range(d + 1)}
    for value in t:
        assert min(abs(value - g) for g in grid) < 1e-6


def test_randint_samplers():
    key = jax.random.PRNGKey(0)
    t = sampling.uniform_randint(key, (512, 4, 4, 4))
    assert t.dtype == jnp.int32 and int(t.min()) >= 0 and int(t.max()) < 1000
    g = sampling.gaussian_randint(key, (4096, 4, 4, 4), mean=500, std=100)
    assert 400 < float(g.astype(jnp.float32).mean()) < 600
    s = sampling.sigmoid_randint(key, (512, 4, 4, 4))
    assert int(s.min()) >= 0 and int(s.max()) <= 1000


def test_flux_schedule_monotone():
    ts = get_flux_schedule(20, 4096)
    assert len(ts) == 21
    assert ts[0] == pytest.approx(1.0) and ts[-1] == pytest.approx(0.0)
    assert all(a > b for a, b in zip(ts, ts[1:]))
    lin = get_linear_schedule(10)
    assert lin[0] == 1.0 and lin[-1] == 0.0


def test_min_snr_weighted_loss():
    """min-SNR-gamma weighting: matches the hand-computed per-sample
    weighting, reduces to plain MSE as gamma -> inf, and down-weights
    low-noise (high-SNR) timesteps."""
    from vision_ft_tpu.modules.loss.diffusion import (
        get_alphas_cumprod,
        loss_with_predicted_noise,
        min_snr_weighted_loss,
    )

    key = jax.random.PRNGKey(0)
    b = 4
    noise = jax.random.normal(key, (b, 8, 8, 4))
    pred = noise + 0.1 * jax.random.normal(jax.random.PRNGKey(1), noise.shape)
    t = jnp.array([10, 300, 600, 990])

    got = min_snr_weighted_loss(None, noise, pred, t, gamma=5.0)
    a = get_alphas_cumprod()[t]
    snr = a / (1 - a)
    w = jnp.minimum(snr, 5.0) / snr
    per = jnp.mean(jnp.square(pred - noise).reshape(b, -1), axis=1)
    np.testing.assert_allclose(float(got), float(jnp.mean(w * per)), rtol=1e-6)

    # gamma -> inf: unweighted
    hi = min_snr_weighted_loss(None, noise, pred, t, gamma=1e9)
    np.testing.assert_allclose(
        float(hi), float(loss_with_predicted_noise(None, noise, pred)), rtol=1e-6
    )

    # early timesteps (high SNR) carry weight < 1; late ones ~= 1
    assert float(w[0]) < 0.1 and float(w[3]) == pytest.approx(1.0)
