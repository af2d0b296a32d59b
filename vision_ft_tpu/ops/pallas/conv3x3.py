"""Pallas TPU fused 3x3 stride-1 convolution (NHWC).

XLA runs SDXL's 3x3 convs at ~23% of the v5e MXU, and the 9-shifted-
matmul XLA form re-reads the input nine times from HBM. This kernel
keeps a row-block of the input resident in VMEM (three vertically
shifted views prepared in XLA) and accumulates all nine taps as MXU
matmuls into an fp32 register tile.

Forward-only Pallas; the backward pass re-derives through the plain XLA
conv (XLA dead-code-eliminates the primal inside the vjp), so training
uses this transparently via custom_vjp.

NOT wired into nn.core by default: in isolation it beats lax.conv
(27 -> 43 TF/s at 64^2x640) but loses to the XLA 9-tap matmul form
end-to-end on the SDXL bench (7.93 vs 8.22 steps/s) because XLA fuses
bias/SiLU/residual consumers into the tap matmuls while a custom call
is a fusion barrier. Kept as a tested building block for shapes where
the fusion tradeoff flips (e.g. conv-dominated VAEs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl


def _kernel(top_ref, mid_ref, bot_ref, w_ref, o_ref, *, width: int):
    # refs: rows (1, BH, W+2, C); w (3, 3, C, BCO); out (1, BH, W, BCO)
    bh = o_ref.shape[1]
    bco = o_ref.shape[3]
    acc = jnp.zeros((bh * width, bco), jnp.float32)
    for r, ref in enumerate((top_ref, mid_ref, bot_ref)):
        rows = ref[0]  # (BH, W+2, C)
        for dx in range(3):
            patch = rows[:, dx : dx + width, :].reshape(bh * width, -1)
            acc = acc + jnp.dot(
                patch, w_ref[r, dx], preferred_element_type=jnp.float32
            )
    o_ref[0] = acc.reshape(bh, width, bco).astype(o_ref.dtype)


def _pick_blocks(h: int, w: int, c: int, co: int):
    """(block_rows, block_co) fitting VMEM with Pallas double buffering
    (every in/out block is held twice), or None. Budget 14MB of the 16MB
    scoped limit."""
    budget = 14 * 1024 * 1024
    # the block's last dim must be a 128 multiple OR the full dimension
    for bco in (co, 512, 256, 128):
        bco_eff = min(bco, co)
        if co % bco_eff != 0:
            continue
        if bco_eff % 128 != 0 and bco_eff != co:
            continue
        weight_bytes = 2 * 9 * c * bco_eff * 2  # double-buffered bf16
        if weight_bytes > budget * 3 // 4:
            continue
        # per output-row cost: 3 double-buffered input views + out (x2) + acc
        per_row = 2 * 3 * (w + 2) * c * 2 + 2 * w * bco_eff * 2 + w * bco_eff * 4
        bh = min(max((budget - weight_bytes) // max(per_row, 1), 0), h)
        while bh > 0 and h % bh != 0:
            bh -= 1
        if bh >= 1:
            return bh, bco_eff
    return None


def conv3x3_supported(x_shape, co: int) -> bool:
    _, h, w, c = x_shape
    return _pick_blocks(h, w, c, co) is not None


def _conv3x3_fwd(x: jax.Array, w: jax.Array) -> jax.Array:
    b, h, width, c = x.shape
    co = w.shape[0]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    top = xp[:, 0:h, :, :]
    mid = xp[:, 1 : h + 1, :, :]
    bot = xp[:, 2 : h + 2, :, :]
    whwio = jnp.transpose(w, (2, 3, 1, 0)).astype(x.dtype)  # (kh, kw, in, out)

    blocks = _pick_blocks(h, width, c, co)
    assert blocks is not None, "conv3x3_tpu called on an unsupported shape"
    block_rows, bco = blocks
    grid = (b, h // block_rows, co // bco)

    row_spec = pl.BlockSpec(
        (1, block_rows, width + 2, c), lambda bi, i, j: (bi, i, 0, 0)
    )
    return pl.pallas_call(
        functools.partial(_kernel, width=width),
        grid=grid,
        in_specs=[
            row_spec,
            row_spec,
            row_spec,
            pl.BlockSpec((3, 3, c, bco), lambda bi, i, j: (0, 0, 0, j)),
        ],
        out_specs=pl.BlockSpec(
            (1, block_rows, width, bco), lambda bi, i, j: (bi, i, 0, j)
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, width, co), x.dtype),
    )(top, mid, bot, whwio)


def _xla_conv(x: jax.Array, w: jax.Array) -> jax.Array:
    return lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "OIHW", "NHWC"),
    )


@jax.custom_vjp
def conv3x3_tpu(x: jax.Array, w: jax.Array) -> jax.Array:
    """y = conv3x3(x, w), x (B,H,W,C) bf16, w (CO,C,3,3), stride 1 pad 1."""
    return _conv3x3_fwd(x, w)


def _fwd(x, w):
    return _conv3x3_fwd(x, w), (x, w)


def _bwd(res, dy):
    x, w = res
    _, vjp = jax.vjp(_xla_conv, x, w)
    return vjp(dy)


conv3x3_tpu.defvjp(_fwd, _bwd)
