"""Fused Pallas GroupNorm(+SiLU) vs the nn.core XLA formula."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_ft_tpu.nn.core import GroupNorm
from vision_ft_tpu.ops.pallas.group_norm import group_norm_tpu, supported


@pytest.mark.parametrize("act", [None, "silu"])
@pytest.mark.parametrize("shape,groups", [((2, 8, 8, 320), 32), ((2, 64, 128), 32)])
def test_forward_matches_xla(shape, groups, act):
    c = shape[-1]
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, shape, jnp.float32) * 2.0 + 0.5
    gamma = jax.random.normal(jax.random.PRNGKey(1), (c,)) * 0.1 + 1.0
    beta = jax.random.normal(jax.random.PRNGKey(2), (c,)) * 0.1

    gn = GroupNorm(groups, c)
    ref = gn({"weight": gamma, "bias": beta}, x)
    if act == "silu":
        ref = jax.nn.silu(ref)

    assert supported(x, groups)
    got = group_norm_tpu(x, gamma, beta, groups, 1e-5, act)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_grad_matches_xla():
    c, groups = 320, 32
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 8, 8, c), jnp.float32)
    gamma = jnp.ones((c,))
    beta = jnp.zeros((c,))
    gn = GroupNorm(groups, c)

    def loss_ref(x, g, b):
        return jnp.sum(jnp.sin(jax.nn.silu(gn({"weight": g, "bias": b}, x))))

    def loss_new(x, g, b):
        return jnp.sum(jnp.sin(group_norm_tpu(x, g, b, groups, 1e-5, "silu")))

    ref = jax.grad(loss_ref, (0, 1, 2))(x, gamma, beta)
    got = jax.grad(loss_new, (0, 1, 2))(x, gamma, beta)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=1e-4, rtol=1e-4)


def test_unsupported_shapes_guarded():
    assert not supported(jnp.zeros((2, 320)), 32)  # rank 2
    assert not supported(jnp.zeros((2, 4, 330)), 32)  # channels not divisible
