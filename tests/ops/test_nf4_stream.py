"""Panel-streamed NF4 matmul (ops/nf4_stream) vs the XLA dequant golden.

Reference behavior: bnb dequantize_4bit + torch.nn.functional.linear
(/root/reference/src/modules/quant/functional.py:342-371); the golden
here is the bit-compatible XLA path (modules/quant/nf4.py), itself
byte-golden-tested against bnb in test_quant_goldens.py. The streamed
path must match it EXACTLY when the panel covers the whole weight and to
dot-reassociation tolerance when scanning multiple panels.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_ft_tpu.modules.quant.nf4 import dequantize_4bit, quantize_4bit
from vision_ft_tpu.ops.nf4_stream import (
    nf4_stream_matmul,
    pick_panel,
    supports,
)
from vision_ft_tpu.ops.pallas.nf4_matmul import to_split_layout


def _quantized_split(n, k, seed=0):
    rng = np.random.default_rng(seed)
    w = rng.standard_normal((n, k)).astype(np.float32) * 0.02
    packed, state = quantize_4bit(w, quant_type="nf4")
    packed_split = to_split_layout(np.asarray(packed), (n, k))
    return (
        jnp.asarray(packed_split),
        jnp.asarray(state["quant_map"]),
        jnp.asarray(state["absmax"]),
    )


def _reference(x, packed_split, code, absmax, shape):
    w = dequantize_4bit(
        packed_split, code, absmax, shape, 64, jnp.bfloat16, split=True
    )
    return jax.lax.dot_general(
        x, w, (((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=x.dtype,
    )


@pytest.mark.parametrize(
    "m,k,n",
    [
        (64, 256, 128),      # single panel (bn == n)
        (100, 512, 256),     # ragged m
        (32, 8192, 8192),    # multi-panel: 32 MB target -> bn < n
    ],
)
def test_stream_forward_matches_xla_dequant(m, k, n):
    assert supports(n, k, 64)
    packed, code, absmax = _quantized_split(n, k)
    x = jax.random.normal(jax.random.key(1), (m, k), jnp.bfloat16)
    got = jax.jit(
        lambda x: nf4_stream_matmul(x, packed, code, absmax, (n, k))
    )(x)
    want = _reference(x, packed, code, absmax, (n, k))
    assert got.shape == (m, n)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0, atol=2e-2 * np.abs(np.asarray(want, np.float32)).max() + 1e-6,
    )


def test_stream_multi_panel_geometry():
    n, k = 8192, 8192
    bn = pick_panel(n, k)
    assert bn < n and n % bn == 0 and bn % 128 == 0


def test_stream_backward_dx_matches_xla():
    """dx through the streamed custom VJP (CPU panel-scan branch) matches
    the XLA dequant path; packed/absmax/code get zero cotangents."""
    m, k, n = 24, 8192, 8192
    packed, code, absmax = _quantized_split(n, k)
    x = jax.random.normal(jax.random.key(3), (m, k), jnp.bfloat16)

    def loss_stream(x):
        return jnp.sum(
            nf4_stream_matmul(x, packed, code, absmax, (n, k)).astype(
                jnp.float32
            )
        )

    def loss_xla(x):
        return jnp.sum(
            _reference(x, packed, code, absmax, (n, k)).astype(jnp.float32)
        )

    dx = jax.jit(jax.grad(loss_stream))(x)
    dx_ref = jax.jit(jax.grad(loss_xla))(x)
    np.testing.assert_allclose(
        np.asarray(dx, np.float32), np.asarray(dx_ref, np.float32),
        rtol=0, atol=3e-2 * np.abs(np.asarray(dx_ref, np.float32)).max() + 1e-6,
    )


def test_linear_dispatches_stream_under_env(monkeypatch):
    """nn.core.Linear routes a packed split weight through the streamed
    path when VFT_NF4_STREAM=1, numerics matching the XLA-dequant route."""
    from vision_ft_tpu.nn.core import Linear

    n, k = 256, 512
    packed, code, absmax = _quantized_split(n, k)
    params = {
        "weight": {
            "packed": packed,
            "code": code,
            "absmax": absmax,
            "split": jnp.ones((), jnp.uint8),
        }
    }
    layer = Linear(k, n, bias=False)
    x = jax.random.normal(jax.random.key(5), (8, k), jnp.bfloat16)
    monkeypatch.setenv("VFT_NF4_STREAM", "1")
    got = layer(params, x)
    monkeypatch.setenv("VFT_NF4_STREAM", "0")
    want = layer(params, x)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0, atol=2e-2 * np.abs(np.asarray(want, np.float32)).max() + 1e-6,
    )
