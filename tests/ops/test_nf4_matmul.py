"""Fused 4-bit quantized matmul kernel vs the XLA dequant reference.

Reference behavior: bnb dequantize_4bit + torch.nn.functional.linear
(/root/reference/src/modules/quant/functional.py:342-371). Here the
golden is our own bit-compatible XLA path (modules/quant/nf4.py), which
is itself golden-tested byte-level against bnb in test_quant_goldens.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_ft_tpu.modules.quant.nf4 import dequantize_4bit, quantize_4bit
from vision_ft_tpu.ops.pallas.nf4_matmul import nf4_matmul, supports


def _quantized(n, k, quant_type="nf4", seed=0):
    rng = np.random.default_rng(seed)
    w = rng.standard_normal((n, k)).astype(np.float32) * 0.02
    packed, state = quantize_4bit(w, quant_type=quant_type)
    code = jnp.asarray(state["quant_map"])
    absmax = jnp.asarray(state["absmax"])
    return jnp.asarray(packed), code, absmax


def _reference(x, packed, code, absmax, shape):
    w = dequantize_4bit(packed, code, absmax, shape, 64, jnp.bfloat16)
    return jax.lax.dot_general(
        x, w, (((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=x.dtype,
    )


@pytest.mark.parametrize(
    "m,k,n",
    [
        (64, 256, 128),     # single K step, single N step
        (100, 512, 256),    # M padding (100 -> 128-multiple of BM)
        (32, 1280, 384),    # multi-K (1280/2/512 not integral -> BKh=128), BN=128
    ],
)
def test_forward_matches_xla_dequant(m, k, n):
    assert supports(m, k, n, 64)
    packed, code, absmax = _quantized(n, k)
    x = jax.random.normal(jax.random.key(1), (m, k), jnp.bfloat16)
    got = nf4_matmul(x, packed, code, absmax, (n, k), interpret=True)
    want = _reference(x, packed, code, absmax, (n, k))
    assert got.shape == (m, n)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0, atol=2e-2 * np.abs(np.asarray(want, np.float32)).max() + 1e-6,
    )


def test_forward_fp4_codebook():
    m, k, n = 16, 256, 128
    packed, code, absmax = _quantized(n, k, quant_type="fp4")
    x = jax.random.normal(jax.random.key(2), (m, k), jnp.bfloat16)
    got = nf4_matmul(x, packed, code, absmax, (n, k), interpret=True)
    want = _reference(x, packed, code, absmax, (n, k))
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0, atol=2e-2 * np.abs(np.asarray(want, np.float32)).max() + 1e-6,
    )


def test_leading_batch_dims():
    b, s, k, n = 2, 24, 256, 128
    packed, code, absmax = _quantized(n, k)
    x = jax.random.normal(jax.random.key(3), (b, s, k), jnp.bfloat16)
    got = nf4_matmul(x, packed, code, absmax, (n, k), interpret=True)
    want = _reference(x, packed, code, absmax, (n, k))
    assert got.shape == (b, s, n)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0, atol=2e-2 * np.abs(np.asarray(want, np.float32)).max() + 1e-6,
    )


def test_grad_x_matches_xla_dequant():
    m, k, n = 40, 512, 128
    packed, code, absmax = _quantized(n, k)
    x = jax.random.normal(jax.random.key(4), (m, k), jnp.float32).astype(jnp.bfloat16)
    co = jax.random.normal(jax.random.key(5), (m, n), jnp.bfloat16)

    def f_kernel(x):
        return (nf4_matmul(x, packed, code, absmax, (n, k), interpret=True) * co).sum()

    def f_ref(x):
        return (_reference(x, packed, code, absmax, (n, k)) * co).sum()

    gk = jax.grad(f_kernel)(x)
    gr = jax.grad(f_ref)(x)
    scale = np.abs(np.asarray(gr, np.float32)).max() + 1e-6
    np.testing.assert_allclose(
        np.asarray(gk, np.float32), np.asarray(gr, np.float32),
        rtol=0, atol=3e-2 * scale,
    )
    # frozen base: quant-state leaves must not receive real cotangents
    g_absmax = jax.grad(
        lambda am: (nf4_matmul(x, packed, code, am, (n, k), interpret=True) * co).sum()
    )(absmax)
    assert float(jnp.abs(g_absmax).max()) == 0.0


def test_supports_contract():
    assert not supports(8, 192, 128, 64)   # K % 256
    assert not supports(8, 256, 96, 64)    # N % 128
    assert not supports(8, 256, 128, 128)  # non-default blocksize
    assert supports(1, 10240, 1280, 64)
