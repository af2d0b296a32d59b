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


# -- split device layout ------------------------------------------------------
# to_split_layout re-packs bnb bytes once at load so both nibble planes read
# CONTIGUOUS activation slices (no stride-2 lane deinterleave of x per call —
# the XLA gather fusion for that overflowed scoped VMEM at AuraFlow shapes).

from vision_ft_tpu.ops.pallas.nf4_matmul import from_split_layout, to_split_layout


def test_split_layout_round_trip():
    rng = np.random.default_rng(7)
    n, k = 128, 512
    packed = rng.integers(0, 256, (n, k // 2), dtype=np.uint8)
    sp = to_split_layout(packed, (n, k))
    np.testing.assert_array_equal(from_split_layout(sp, (n, k)), packed)
    assert not np.array_equal(sp, packed)  # it really is a different layout


def test_split_dequant_matches_bnb_dequant():
    n, k = 128, 512
    packed, code, absmax = _quantized(n, k)
    sp = jnp.asarray(to_split_layout(np.asarray(packed), (n, k)))
    want = dequantize_4bit(packed, code, absmax, (n, k), 64, jnp.float32)
    got = dequantize_4bit(sp, code, absmax, (n, k), 64, jnp.float32, split=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize(
    "m,k,n",
    [
        (64, 256, 128),    # single K step
        (100, 512, 256),   # M padding
        (32, 1280, 384),   # multi-K (BKh=128), BN=128
    ],
)
def test_split_forward_matches_bnb_kernel(m, k, n):
    packed, code, absmax = _quantized(n, k)
    sp = jnp.asarray(to_split_layout(np.asarray(packed), (n, k)))
    x = jax.random.normal(jax.random.key(11), (m, k), jnp.bfloat16)
    got = nf4_matmul(x, sp, code, absmax, (n, k), interpret=True, split=True)
    want = _reference(x, packed, code, absmax, (n, k))
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0, atol=2e-2 * np.abs(np.asarray(want, np.float32)).max() + 1e-6,
    )


def test_split_grad_matches_xla_dequant():
    m, k, n = 40, 512, 128
    packed, code, absmax = _quantized(n, k)
    sp = jnp.asarray(to_split_layout(np.asarray(packed), (n, k)))
    x = jax.random.normal(jax.random.key(12), (m, k), jnp.float32).astype(jnp.bfloat16)
    co = jax.random.normal(jax.random.key(13), (m, n), jnp.bfloat16)

    gk = jax.grad(
        lambda x: (nf4_matmul(x, sp, code, absmax, (n, k),
                              interpret=True, split=True) * co).sum()
    )(x)
    gr = jax.grad(
        lambda x: (_reference(x, packed, code, absmax, (n, k)) * co).sum()
    )(x)
    scale = np.abs(np.asarray(gr, np.float32)).max() + 1e-6
    np.testing.assert_allclose(
        np.asarray(gk, np.float32), np.asarray(gr, np.float32),
        rtol=0, atol=3e-2 * scale,
    )


def test_quantize_weight_produces_split_device_layout():
    """The param-tree producer emits the split layout + marker, and the
    fallback dequant on that subtree equals the bnb-byte dequant."""
    from vision_ft_tpu.modules.quant.functional import (
        dequantize_weight,
        quantize_weight,
    )
    from vision_ft_tpu.modules.quant.nf4 import quantize_4bit

    rng = np.random.default_rng(3)
    w = rng.standard_normal((128, 512)).astype(np.float32) * 0.02
    sub = quantize_weight(w, "bnb_nf4")
    assert "split" in sub
    packed_bnb, _ = quantize_4bit(w, quant_type="nf4")
    np.testing.assert_array_equal(
        from_split_layout(np.asarray(sub["packed"]), (128, 512)),
        np.asarray(packed_bnb).reshape(128, 256),
    )
    dq = dequantize_weight(sub, dtype=jnp.float32)
    want = dequantize_4bit(
        jnp.asarray(packed_bnb), sub["code"], sub["absmax"], (128, 512), 64,
        jnp.float32,
    )
    np.testing.assert_array_equal(np.asarray(dq), np.asarray(want))
