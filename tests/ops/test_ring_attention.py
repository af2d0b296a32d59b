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


def _explicit_with_lse(q, k, v, scale):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    l = jnp.sum(p, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", p, v) / l[..., None]
    return out, m[..., 0] + jnp.log(l)


@pytest.mark.parametrize("s_q,s_k", [(64, 64), (192, 320), (128, 96)])
def test_pallas_lse_path_matches_explicit(s_q, s_k):
    """flash_attention_with_lse (interpret) — incl. non-block-multiple
    shard lengths, the ADVICE round-1 silent-drop case."""
    from vision_ft_tpu.ops.pallas.flash_attention import flash_attention_with_lse

    b, h, d = 1, 2, 32
    q = jax.random.normal(jax.random.PRNGKey(0), (b, h, s_q, d), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, s_k, d), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, s_k, d), jnp.float32)
    out, lse = flash_attention_with_lse(q, k, v, scale=d**-0.5, interpret=True)
    want_o, want_lse = _explicit_with_lse(q, k, v, d**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want_o), atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(want_lse), atol=2e-5, rtol=2e-5)


def test_pallas_lse_grad_through_merge():
    """Grad flows through the Pallas shard partial *and* the lse merge —
    the exact composite the TPU ring backward uses."""
    from vision_ft_tpu.ops.ring_attention import _local_partial, _merge

    b, h, s, d = 1, 2, 64, 16
    scale = d**-0.5
    key = jax.random.PRNGKey(3)
    q = jax.random.normal(key, (b, h, s, d), jnp.float32)
    k1, k2 = jnp.split(jax.random.normal(jax.random.PRNGKey(4), (b, h, 2 * s, d)), 2, axis=2)
    v1, v2 = jnp.split(jax.random.normal(jax.random.PRNGKey(5), (b, h, 2 * s, d)), 2, axis=2)

    def loss_pallas(q):
        o1, l1 = _local_partial(q, k1, v1, scale, _force_pallas=True)
        o2, l2 = _local_partial(q, k2, v2, scale, _force_pallas=True)
        out, _ = _merge(o1, l1, o2, l2)
        return jnp.sum(jnp.sin(out))

    def loss_full(q):
        kf = jnp.concatenate([k1, k2], axis=2)
        vf = jnp.concatenate([v1, v2], axis=2)
        return jnp.sum(jnp.sin(_xla_attention(q, kf, vf, None, scale, False)))

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_pallas)(q)),
        np.asarray(jax.grad(loss_full)(q)),
        atol=5e-5, rtol=5e-4,
    )


def test_ring_under_jit_and_uneven_rejected():
    mesh = _mesh()
    q = jnp.zeros((1, 1, 64, 8))
    out = jax.jit(lambda q: ring_attention(q, q, q, mesh))(q)
    assert out.shape == q.shape
    with pytest.raises(AssertionError):
        ring_attention(jnp.zeros((1, 1, 60, 8)), jnp.zeros((1, 1, 60, 8)),
                       jnp.zeros((1, 1, 60, 8)), mesh)
