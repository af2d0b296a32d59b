"""Panel-streamed NF4 matmul: XLA-dequant speed at bounded memory.

The r4 decision matrix (docs/PERFORMANCE.md "NF4 4-bit base") measured
the fused Pallas NF4 matmul as the memory-enabling default but 9-31%
slower than XLA dequant where both fit: the Pallas kernel re-dequantizes
every (BN, BKh) weight tile once per M grid step (VPU select chains that
run ~M/BM times over the whole weight), while XLA dequantizes once —
but XLA must materialize the FULL (n, k) bf16 weight as an HBM temp,
and at 6.8B-scale the scheduler keeps enough of those alive to OOM a
16 GB chip (the AuraFlow b1 QLoRA failure).

This path takes the middle: a ``lax.scan`` over N-panels of the packed
weight. Each iteration XLA-dequantizes ONE (bn, k) panel (the only
weight-sized temp alive, double-buffered by the scheduler) and runs a
dense (m, k) @ (k, bn) matmul. Dequant cost is paid once per element
(like XLA), peak weight temp is one panel (like the fused kernel).

Backward (QLoRA: base frozen, dx only) reuses the fused Pallas dx
kernel — packed stays the only resident form, so training memory
matches the fused path exactly.

Reference behavior matched: bnb dequantize_4bit + F.linear
(/root/reference/src/modules/quant/functional.py:342-371).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# target panel footprint. 32 MB measured decisively better than 8 MB
# (AuraFlow NF4 generate 17.00 vs 21.06 s — small panels starve the
# per-panel dot and multiply scan steps); still structurally bounded
# (the scan serializes panel lifetimes, unlike the unbounded XLA
# dequant whose scheduler keeps many full-weight temps live at once).
# VFT_NF4_PANEL_MB overrides for sweeps.
_PANEL_BYTES = 32 * 1024 * 1024


def pick_panel(n: int, k: int) -> int:
    import os

    panel_bytes = _PANEL_BYTES
    env = os.environ.get("VFT_NF4_PANEL_MB")
    if env:
        panel_bytes = int(float(env) * 1024 * 1024)
    bn = max(128, min(n, panel_bytes // max(1, 2 * k) // 128 * 128))
    while n % bn:
        bn -= 128
    return max(bn, 128) if n % 128 == 0 else n


def supports(n: int, k: int, blocksize: int) -> bool:
    """Same contract as the fused kernel, minus its K%256 constraint."""
    return (
        n % 128 == 0 and k % 2 == 0 and blocksize == 64
        and k % blocksize == 0
    )


def _dequant_panel(pj, aj, code, bn: int, k: int, blocksize: int, dtype):
    from ..modules.quant.nf4 import dequantize_4bit

    return dequantize_4bit(
        pj, code, aj.reshape(-1), (bn, k), blocksize=blocksize, dtype=dtype,
        split=True,
    )


def _fwd_impl(x2, packed2, absmax2, code, *, blocksize, dtype):
    m, k = x2.shape
    n = packed2.shape[0]
    bn = pick_panel(n, k)
    if bn >= n:
        w = _dequant_panel(packed2, absmax2, code, n, k, blocksize, dtype)
        return lax.dot_general(
            x2, w, (((1,), (1,)), ((), ())), preferred_element_type=dtype
        )
    panels = packed2.reshape(n // bn, bn, k // 2)
    apanels = absmax2.reshape(n // bn, bn, k // blocksize)

    def body(_, inputs):
        pj, aj = inputs
        wj = _dequant_panel(pj, aj, code, bn, k, blocksize, dtype)
        yj = lax.dot_general(
            x2, wj, (((1,), (1,)), ((), ())), preferred_element_type=dtype
        )
        return None, yj

    _, ys = lax.scan(body, None, (panels, apanels))
    # (n/bn, m, bn) -> (m, n): one output-sized relayout
    return jnp.moveaxis(ys, 0, 1).reshape(m, n)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _nf4_stream2d(x2, packed2, absmax2, code, blocksize, dtype):
    return _fwd_impl(x2, packed2, absmax2, code, blocksize=blocksize,
                     dtype=dtype)


def _stream_fwd(x2, packed2, absmax2, code, blocksize, dtype):
    y = _fwd_impl(x2, packed2, absmax2, code, blocksize=blocksize,
                  dtype=dtype)
    return y, (packed2, absmax2, code)


def _stream_bwd(blocksize, dtype, res, dy):
    packed2, absmax2, code = res
    k = packed2.shape[1] * 2
    # frozen base: only dx flows. The fused Pallas dx kernel keeps the
    # weight packed (no bf16 weight temp in the backward); fall back to
    # a panel scan when its shape contract doesn't hold.
    from .pallas.nf4_matmul import _dx_impl
    from .pallas.nf4_matmul import supports as _fused_supports

    n = packed2.shape[0]
    m = dy.shape[0]
    if jax.default_backend() == "tpu" and _fused_supports(m, k, n, blocksize):
        code2d = code.astype(jnp.float32).reshape(1, 16)
        dx = _dx_impl(
            dy.astype(dtype), packed2, absmax2.astype(jnp.float32),
            code2d, k=k, blocksize=blocksize, dtype=dtype, interpret=False,
            split=True,
        )
    else:
        bn = pick_panel(n, k)
        if bn >= n:
            w = _dequant_panel(packed2, absmax2, code, n, k, blocksize, dtype)
            dx = lax.dot_general(
                dy.astype(dtype), w, (((1,), (0,)), ((), ())),
                preferred_element_type=dtype,
            )
        else:
            panels = packed2.reshape(n // bn, bn, k // 2)
            apanels = absmax2.reshape(n // bn, bn, k // blocksize)
            dyp = jnp.moveaxis(
                dy.astype(dtype).reshape(m, n // bn, bn), 1, 0
            )

            def body(carry, inputs):
                pj, aj, dyj = inputs
                wj = _dequant_panel(pj, aj, code, bn, k, blocksize, dtype)
                return carry + lax.dot_general(
                    dyj, wj, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ), None

            dx0 = jnp.zeros((m, k), jnp.float32)
            dx, _ = lax.scan(body, dx0, (panels, apanels, dyp))
            dx = dx.astype(dtype)
    zero_packed = np.zeros(packed2.shape, jax.dtypes.float0)
    return dx, zero_packed, jnp.zeros_like(absmax2), jnp.zeros_like(code)


_nf4_stream2d.defvjp(_stream_fwd, _stream_bwd)


def nf4_stream_matmul(
    x: jax.Array,
    packed: jax.Array,
    code: jax.Array,
    absmax: jax.Array,
    shape: tuple[int, int],
    blocksize: int = 64,
) -> jax.Array:
    """x @ W^T with W packed split-layout NF4, dequantized panel-by-panel
    under a scan. Callers check :func:`supports` first; weight must be in
    the split device layout (the canonical on-device form)."""
    n, k = shape
    lead = x.shape[:-1]
    m = int(np.prod(lead)) if lead else 1
    x2 = x.reshape(m, k)
    packed2 = packed.reshape(n, k // 2)
    absmax2 = absmax.astype(jnp.float32).reshape(n, k // blocksize)
    y = _nf4_stream2d(x2, packed2, absmax2, code.astype(jnp.float32),
                      blocksize, x.dtype)
    return y.reshape(*lead, n)
