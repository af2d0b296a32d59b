"""Pallas fused conv3x3 (non-default op): correctness vs lax.conv."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.mark.skipif(jax.default_backend() == "cpu", reason="TPU kernel")
def test_conv3x3_kernel_parity():
    from vision_ft_tpu.ops.pallas.conv3x3 import _xla_conv, conv3x3_tpu

    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (2, 16, 16, 128), jnp.bfloat16)
    w = jax.random.normal(k, (128, 128, 3, 3), jnp.bfloat16) * 0.02
    got = conv3x3_tpu(x, w)
    ref = _xla_conv(x, w)
    rel = float(
        jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)).max()
        / jnp.abs(ref.astype(jnp.float32)).max()
    )
    assert rel < 2e-2


def test_conv3x3_block_picker():
    from vision_ft_tpu.ops.pallas.conv3x3 import _pick_blocks, conv3x3_supported

    # SDXL shapes all feasible
    for c, hw, co in [(320, 128, 320), (640, 64, 640), (1280, 32, 1280)]:
        blocks = _pick_blocks(hw, hw, c, co)
        assert blocks is not None
        bh, bco = blocks
        assert hw % bh == 0 and co % bco == 0
        assert bco % 128 == 0 or bco == co
    # absurd channel count -> unsupported, caller falls back
    assert not conv3x3_supported((1, 8, 8, 65536), 65536)
