"""Fused GeGLU MLP Pallas kernel (TPU).

The reference's GeGLU feed-forward (``FeedForward`` in
/root/reference/src/models/sdxl/denoiser.py:119-149 and the diffusers
blocks it mirrors) is three HBM-bound XLA ops: up-projection ->
split/gelu/mul -> down-projection. XLA cannot fuse an elementwise
producer into a matmul operand, so the (M, 2*inner) up-projection output
round-trips HBM (write + read: 2 * M * 2I * 2 bytes — 336 MB per ff at
SDXL's 640-ch blocks, batch 4 @1024px) and the gated (M, inner) product
round-trips again (168 MB). At the measured 663 GB/s that is ~0.76 ms of
pure relayout traffic per ff on top of the matmul time — the profiled
"~60 TF/s ff2 fusions".

This kernel runs the whole ff in VMEM: grid (M tiles, inner chunks) with
the chunk axis innermost (sequential on TPU), a grid-persistent f32
output accumulator (its index map is constant in the chunk axis — the
same cross-grid-step trick as the flash backward's fused dq), and per
chunk: h = x @ W1h^T, g = x @ W1g^T, acc += (h * gelu(g)) @ W2chunk^T.
The wide intermediate never exists outside a (tile_m, chunk) VMEM block.
Weights stay in their torch (out, in) layout — the MXU takes the
contraction on dim 1 of both operands directly, so no transposes are
materialized.

Backward falls back to the plain XLA formulation via custom_vjp (the
memory-side win in training comes from remat policies, not this path);
the forward kernel is what the generate/serving path and the headline
bench ride.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

TILE_M = 256
CHUNK = 512


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _geglu_kernel(x_ref, w1h_ref, w1g_ref, b1h_ref, b1g_ref, w2_ref, b2_ref,
                  o_ref):
    kj = pl.program_id(1)

    @pl.when(kj == 0)
    def _init():
        # bias of the down projection seeds the accumulator
        o_ref[...] = jnp.broadcast_to(
            b2_ref[0][None, :], o_ref.shape
        ).astype(jnp.float32)

    x = x_ref[...]  # (TM, C) bf16
    # weights are torch-layout (out, in): contract dim 1 with dim 1
    h = jax.lax.dot_general(
        x, w1h_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1h_ref[0][None, :]
    g = jax.lax.dot_general(
        x, w1g_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1g_ref[0][None, :]
    a = (h * jax.nn.gelu(g, approximate=True)).astype(x.dtype)
    o_ref[...] += jax.lax.dot_general(
        a, w2_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _geglu_fwd_kernel_call(x2, w1, b1, w2, b2, interpret):
    m, c = x2.shape
    inner = w2.shape[1]  # w2: (C, inner) torch layout
    chunk = CHUNK if inner % CHUNK == 0 else 256
    assert inner % chunk == 0, (inner, chunk)
    num_chunks = inner // chunk

    tile_m = TILE_M
    m_pad = _round_up(m, tile_m)
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))

    dt = x2.dtype
    # h / gate row halves of the fused up-projection (torch layout:
    # (2*inner, C) rows) — each grid step addresses a contiguous row chunk
    w1h = w1[:inner].astype(dt)
    w1g = w1[inner:].astype(dt)
    b1h = b1[None, :inner].astype(jnp.float32)
    b1g = b1[None, inner:].astype(jnp.float32)
    w2_ = w2.astype(dt)
    b2_ = b2[None, :].astype(jnp.float32)

    out = pl.pallas_call(
        _geglu_kernel,
        grid=(m_pad // tile_m, num_chunks),
        in_specs=[
            pl.BlockSpec((tile_m, c), lambda mi, kj: (mi, 0)),
            pl.BlockSpec((chunk, c), lambda mi, kj: (kj, 0)),
            pl.BlockSpec((chunk, c), lambda mi, kj: (kj, 0)),
            pl.BlockSpec((1, chunk), lambda mi, kj: (0, kj)),
            pl.BlockSpec((1, chunk), lambda mi, kj: (0, kj)),
            pl.BlockSpec((c, chunk), lambda mi, kj: (0, kj)),
            pl.BlockSpec((1, c), lambda mi, kj: (0, 0)),
        ],
        # constant in kj: persistent f32 accumulator across inner chunks
        out_specs=pl.BlockSpec((tile_m, c), lambda mi, kj: (mi, 0)),
        out_shape=jax.ShapeDtypeStruct((m_pad, c), jnp.float32),
        interpret=interpret,
    )(x2, w1h, w1g, b1h, b1g, w2_, b2_)
    return out[:m].astype(dt)


def _geglu_ref(x2, w1, b1, w2, b2):
    """Plain XLA formulation — the backward path and the numerics oracle.
    Matches FeedForward.__call__ on the bf16 fast path (tanh gelu)."""
    dt = x2.dtype
    h = (x2 @ w1.astype(dt).T) + b1.astype(dt)
    h, gate = jnp.split(h, 2, axis=-1)
    a = h * jax.nn.gelu(gate, approximate=True)
    return (a @ w2.astype(dt).T) + b2.astype(dt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _geglu_core(x2, w1, b1, w2, b2, interpret):
    return _geglu_fwd_kernel_call(x2, w1, b1, w2, b2, interpret)


def _geglu_core_fwd(x2, w1, b1, w2, b2, interpret):
    return _geglu_fwd_kernel_call(x2, w1, b1, w2, b2, interpret), (
        x2, w1, b1, w2, b2,
    )


def _geglu_core_bwd(interpret, res, g):
    x2, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(_geglu_ref, x2, w1, b1, w2, b2)
    return vjp(g.astype(x2.dtype))


_geglu_core.defvjp(_geglu_core_fwd, _geglu_core_bwd)


def supported(c: int, inner: int) -> bool:
    """Lane/tile-aligned shapes only; everything else keeps the XLA path."""
    return c % 128 == 0 and (inner % CHUNK == 0 or inner % 256 == 0)


def geglu_mlp(
    x: jax.Array,
    w1: jax.Array,
    b1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """Fused GeGLU feed-forward: ``(h * gelu_tanh(g)) @ w2^T + b2`` where
    ``[h | g] = x @ w1^T + b1`` — without the wide intermediate ever
    touching HBM.

    ``x``: (..., C); ``w1``: (2*inner, C) torch layout; ``w2``:
    (C, inner) torch layout.
    """
    c = x.shape[-1]
    lead = x.shape[:-1]
    x2 = x.reshape(-1, c)
    out = _geglu_core(x2, w1, b1, w2, b2, interpret)
    return out.reshape(*lead, c)
