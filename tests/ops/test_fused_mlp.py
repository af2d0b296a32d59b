"""Fused GeGLU MLP kernel vs the plain XLA formulation (interpret mode).

Covers the kernel the SDXL FeedForward fast path rides
(vision_ft_tpu/ops/pallas/fused_mlp.py); reference semantics:
/root/reference/src/models/sdxl/denoiser.py FeedForward (GeGLU).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_ft_tpu.ops.pallas.fused_mlp import (
    _gated_ref,
    _geglu_ref,
    gated_mlp,
    geglu_mlp,
    supported,
)


def _params(key, c, inner, dtype=jnp.float32):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    return (
        jax.random.normal(k1, (4, 96, c), dtype) * 0.5,
        jax.random.normal(k2, (2 * inner, c), dtype) * 0.05,
        jax.random.normal(k3, (2 * inner,), dtype) * 0.05,
        jax.random.normal(k4, (c, inner), dtype) * 0.05,
        jax.random.normal(k5, (c,), dtype) * 0.05,
    )


@pytest.mark.parametrize("c,inner", [(128, 512), (256, 1024)])
def test_matches_xla_formulation(c, inner):
    x, w1, b1, w2, b2 = _params(jax.random.PRNGKey(0), c, inner)
    got = geglu_mlp(x, w1, b1, w2, b2, interpret=True)
    want = _geglu_ref(x.reshape(-1, c), w1, b1, w2, b2).reshape(x.shape)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_ragged_rows_padded():
    # M not a multiple of the tile: padded rows must not leak into output
    c, inner = 128, 512
    x, w1, b1, w2, b2 = _params(jax.random.PRNGKey(1), c, inner)
    x = x[:, :37]  # M = 4*37 = 148, not tile-aligned
    got = geglu_mlp(x, w1, b1, w2, b2, interpret=True)
    want = _geglu_ref(x.reshape(-1, c), w1, b1, w2, b2).reshape(x.shape)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_bf16_matches_feedforward_fast_path():
    # the SDXL FeedForward bf16 path uses the tanh gelu — so does the
    # kernel; agreement should be within bf16 rounding of the oracle
    c, inner = 128, 512
    x, w1, b1, w2, b2 = _params(jax.random.PRNGKey(2), c, inner, jnp.bfloat16)
    got = geglu_mlp(x, w1, b1, w2, b2, interpret=True)
    want = _geglu_ref(x.reshape(-1, c), w1, b1, w2, b2).reshape(x.shape)
    np.testing.assert_allclose(
        got.astype(np.float32), want.astype(np.float32), rtol=0.05, atol=0.05
    )


def test_gradients_match_xla():
    c, inner = 128, 512
    x, w1, b1, w2, b2 = _params(jax.random.PRNGKey(3), c, inner)

    def loss_fused(x, w1, b1, w2, b2):
        return jnp.sum(geglu_mlp(x, w1, b1, w2, b2, interpret=True) ** 2)

    def loss_ref(x, w1, b1, w2, b2):
        return jnp.sum(
            _geglu_ref(x.reshape(-1, c), w1, b1, w2, b2) ** 2
        )

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(
            gf.reshape(gr.shape), gr, rtol=1e-4, atol=1e-4
        )


@pytest.mark.parametrize("act", ["silu", "gelu_tanh", "gelu"])
def test_swiglu_split_weights(act):
    # the Lumina2/AuraFlow layout: separate act/gate projections, no bias
    c, inner = 256, 768
    key = jax.random.PRNGKey(7)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x = jax.random.normal(k1, (2, 130, c), jnp.float32) * 0.5  # ragged M
    wa = jax.random.normal(k2, (inner, c), jnp.float32) * 0.05
    wg = jax.random.normal(k3, (inner, c), jnp.float32) * 0.05
    wd = jax.random.normal(k4, (c, inner), jnp.float32) * 0.05
    got = gated_mlp(x, wa, wg, wd, act=act, interpret=True)
    z = jnp.zeros((inner,))
    want = _gated_ref(
        x.reshape(-1, c), wa, z, wg, z, wd, jnp.zeros((c,)), act
    ).reshape(x.shape)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_swiglu_grads():
    c, inner = 128, 512
    key = jax.random.PRNGKey(11)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x = jax.random.normal(k1, (1, 64, c)) * 0.5
    wa = jax.random.normal(k2, (inner, c)) * 0.05
    wg = jax.random.normal(k3, (inner, c)) * 0.05
    wd = jax.random.normal(k4, (c, inner)) * 0.05
    z = jnp.zeros((inner,))

    g_fused = jax.grad(
        lambda *a: jnp.sum(gated_mlp(*a, act="silu", interpret=True) ** 2),
        argnums=(0, 1, 2, 3),
    )(x, wa, wg, wd)
    g_ref = jax.grad(
        lambda x, wa, wg, wd: jnp.sum(
            _gated_ref(x.reshape(-1, c), wa, z, wg, z, wd, jnp.zeros((c,)),
                       "silu") ** 2
        ),
        argnums=(0, 1, 2, 3),
    )(x, wa, wg, wd)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(gf, gr, rtol=1e-4, atol=1e-4)


def test_supported_shapes():
    assert supported(640, 2560)
    assert supported(1280, 5120)
    assert not supported(320, 100)  # unaligned inner
    assert not supported(100, 512)  # unaligned channel
