"""Ring attention vs full attention on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from vision_ft_tpu.ops.attention import _xla_attention
from vision_ft_tpu.ops.ring_attention import ring_attention


def _mesh(n=8, name="sp"):
    devs = np.array(jax.devices()[:n])
    return Mesh(devs, (name,))


@pytest.mark.parametrize("b,h,s,d", [(2, 4, 64, 32), (1, 2, 128, 16)])
def test_ring_matches_full_attention(b, h, s, d):
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, h, s, d), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, s, d), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, s, d), jnp.float32)

    mesh = _mesh()
    got = ring_attention(q, k, v, mesh)
    want = _xla_attention(q, k, v, None, d**-0.5, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_ring_attention_grads_flow():
    b, h, s, d = 1, 2, 64, 16
    mesh = _mesh()
    q = jax.random.normal(jax.random.PRNGKey(0), (b, h, s, d), jnp.float32)

    def loss_ring(q):
        return jnp.sum(jnp.sin(ring_attention(q, q, q, mesh)))

    def loss_full(q):
        return jnp.sum(jnp.sin(_xla_attention(q, q, q, None, d**-0.5, False)))

    g_ring = jax.grad(loss_ring)(q)
    g_full = jax.grad(loss_full)(q)
    np.testing.assert_allclose(np.asarray(g_ring), np.asarray(g_full), atol=5e-5, rtol=5e-4)


def test_ring_under_jit_and_uneven_rejected():
    mesh = _mesh()
    q = jnp.zeros((1, 1, 64, 8))
    out = jax.jit(lambda q: ring_attention(q, q, q, mesh))(q)
    assert out.shape == q.shape
    with pytest.raises(AssertionError):
        ring_attention(jnp.zeros((1, 1, 60, 8)), jnp.zeros((1, 1, 60, 8)),
                       jnp.zeros((1, 1, 60, 8)), mesh)
