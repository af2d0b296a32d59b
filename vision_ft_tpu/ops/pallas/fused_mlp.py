"""Fused gated-MLP Pallas kernel (TPU): GeGLU and SwiGLU feed-forwards.

The gated feed-forwards across the families — SDXL's GeGLU
(/root/reference/src/models/sdxl/denoiser.py FeedForward), Lumina2's and
AuraFlow's SwiGLU (/root/reference/src/models/lumina2/denoiser.py
FeedForward, /root/reference/src/models/auraflow/denoiser.py MLP) — are
three HBM-bound XLA ops: up-projection(s) -> act-gate -> down-projection.
XLA cannot fuse an elementwise producer into a matmul operand, so the
(M, inner) up-projection outputs round-trip HBM (write + read of both the
act and gate streams plus the gated product: ~5 * M * inner * 2 bytes —
~420 MB per ff at SDXL's 640-ch blocks, batch 4 @1024px). At the
measured 663 GB/s that is most of a millisecond of pure relayout traffic
per ff on top of the matmul time — the profiled "~60 TF/s ff2 fusions".

This kernel runs the whole ff in VMEM: grid (M tiles, inner chunks) with
the chunk axis innermost (sequential on TPU), a grid-persistent f32
output accumulator (its index map is constant in the chunk axis — the
same cross-grid-step trick as the flash backward's fused dq), and per
chunk: h = x @ Wa^T, g = x @ Wg^T, acc += (act(h) * g) @ Wd_chunk^T.
The wide intermediates never exist outside (tile_m, chunk) VMEM blocks.
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
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_ACTS = {
    "silu": jax.nn.silu,
    "gelu_tanh": lambda x: jax.nn.gelu(x, approximate=True),
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
}


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _blocks(c: int, inner: int) -> tuple[int, int]:
    """(tile_m, chunk) sized so the double-buffered operand blocks plus
    the persistent f32 accumulator and f32 loop temporaries stay well
    inside the 16 MB scoped-VMEM stack across the supported widths
    (SDXL 640/1280, Lumina2 2304, AuraFlow 3072)."""
    chunk = 512 if c <= 1280 else 256
    while inner % chunk:
        chunk //= 2
    tile_m = 256 if c <= 2304 else 128
    return tile_m, chunk


def _gated_kernel(x_ref, wa_ref, ba_ref, wg_ref, bg_ref, wd_ref, bd_ref,
                  o_ref, *, act):
    kj = pl.program_id(1)

    @pl.when(kj == 0)
    def _init():
        # bias of the down projection seeds the accumulator
        o_ref[...] = jnp.broadcast_to(
            bd_ref[0][None, :], o_ref.shape
        ).astype(jnp.float32)

    x = x_ref[...]  # (TM, C) bf16
    # weights are torch-layout (out, in): contract dim 1 with dim 1
    h = jax.lax.dot_general(
        x, wa_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + ba_ref[0][None, :]
    g = jax.lax.dot_general(
        x, wg_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bg_ref[0][None, :]
    a = (_ACTS[act](h) * g).astype(x.dtype)
    o_ref[...] += jax.lax.dot_general(
        a, wd_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _gated_fwd_kernel_call(x2, wa, ba, wg, bg, wd, bd, act, interpret,
                           off_a=0, off_g=0):
    """``off_a``/``off_g``: row offsets (in chunk units, computed from the
    static shapes) into ``wa``/``wg`` — lets a fused (2*inner, C)
    up-projection (SDXL GeGLU) be addressed in place by passing the same
    array for both operands with different index maps, instead of
    materializing sliced halves in HBM."""
    m, c = x2.shape
    inner = wd.shape[1]  # wd: (C, inner) torch layout
    tile_m, chunk = _blocks(c, inner)
    num_chunks = inner // chunk
    oa, og = off_a * (inner // chunk), off_g * (inner // chunk)

    m_pad = _round_up(m, tile_m)
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))

    dt = x2.dtype
    out = pl.pallas_call(
        functools.partial(_gated_kernel, act=act),
        grid=(m_pad // tile_m, num_chunks),
        in_specs=[
            pl.BlockSpec((tile_m, c), lambda mi, kj: (mi, 0)),
            pl.BlockSpec((chunk, c), lambda mi, kj: (kj + oa, 0)),
            pl.BlockSpec((1, chunk), lambda mi, kj: (0, kj + oa)),
            pl.BlockSpec((chunk, c), lambda mi, kj: (kj + og, 0)),
            pl.BlockSpec((1, chunk), lambda mi, kj: (0, kj + og)),
            pl.BlockSpec((c, chunk), lambda mi, kj: (0, kj)),
            pl.BlockSpec((1, c), lambda mi, kj: (0, 0)),
        ],
        # constant in kj: persistent f32 accumulator across inner chunks
        out_specs=pl.BlockSpec((tile_m, c), lambda mi, kj: (mi, 0)),
        out_shape=jax.ShapeDtypeStruct((m_pad, c), jnp.float32),
        interpret=interpret,
    )(
        x2,
        wa.astype(dt),
        ba[None, :].astype(jnp.float32),
        wg.astype(dt),
        bg[None, :].astype(jnp.float32),
        wd.astype(dt),
        bd[None, :].astype(jnp.float32),
    )
    return out[:m].astype(dt)


def _gated_ref(x2, wa, ba, wg, bg, wd, bd, act):
    """Plain XLA formulation — the backward path and the numerics oracle.
    Matches the modules' bf16 fast paths (tanh gelu / silu)."""
    dt = x2.dtype
    h = (x2 @ wa.astype(dt).T) + ba.astype(dt)
    g = (x2 @ wg.astype(dt).T) + bg.astype(dt)
    a = _ACTS[act](h) * g
    return (a @ wd.astype(dt).T) + bd.astype(dt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def _gated_core(x2, wa, ba, wg, bg, wd, bd, act, interpret, off_a, off_g):
    return _gated_fwd_kernel_call(
        x2, wa, ba, wg, bg, wd, bd, act, interpret, off_a, off_g
    )


def _gated_core_fwd(x2, wa, ba, wg, bg, wd, bd, act, interpret, off_a, off_g):
    return _gated_fwd_kernel_call(
        x2, wa, ba, wg, bg, wd, bd, act, interpret, off_a, off_g
    ), (x2, wa, ba, wg, bg, wd, bd)


def _gated_core_bwd(act, interpret, off_a, off_g, res, g):
    x2, wa, ba, wg, bg, wd, bd = res
    inner = wd.shape[1]
    sa, sg = off_a * inner, off_g * inner

    def ref(x2, wa, ba, wg, bg, wd, bd):
        # half-offset views of a fused up-projection; vjp through the
        # slices scatters the half grads back into the full array shape
        return _gated_ref(
            x2,
            jax.lax.dynamic_slice_in_dim(wa, sa, inner, 0),
            jax.lax.dynamic_slice_in_dim(ba, sa, inner, 0),
            jax.lax.dynamic_slice_in_dim(wg, sg, inner, 0),
            jax.lax.dynamic_slice_in_dim(bg, sg, inner, 0),
            wd, bd, act,
        )

    _, vjp = jax.vjp(ref, x2, wa, ba, wg, bg, wd, bd)
    return vjp(g.astype(x2.dtype))


_gated_core.defvjp(_gated_core_fwd, _gated_core_bwd)


def supported(c: int, inner: int) -> bool:
    """Lane/tile-aligned shapes only; everything else keeps the XLA path."""
    return c % 128 == 0 and inner % 256 == 0


def fused_ff_enabled(x, *param_dicts, inner: Optional[int] = None) -> bool:
    """Shared fast-path gate for the family feed-forwards: bf16
    activations on a real TPU, and every Linear subtree a plain dense
    weight (no NF4/fp8/W8A8 dicts, no LoRA/LoHa adapter keys — those
    keep the XLA formulation whose numerics and adapter deltas the
    parity suite pins).

    Width-auto default (r4 on-chip A/Bs): the kernel WINS on wide DiT
    ffs — Lumina2 generate 8.87 s vs 9.78 s XLA (inner 9216) — and is a
    wash at SDXL widths (10.466 vs 10.482 steps/s on the headline bench,
    inner <= 5120). Unset env -> fused iff ``inner`` >= 8192;
    VFT_FUSED_FF=1/0 forces either way."""
    import os

    env = os.environ.get("VFT_FUSED_FF")
    if env == "0":
        return False
    if env != "1" and (inner is None or inner < 8192):
        return False
    if x.dtype != jnp.bfloat16 or jax.default_backend() != "tpu":
        return False
    for p in param_dicts:
        w = p.get("weight")
        if isinstance(w, dict):
            return False
        # Raw fp8 weights are plain arrays (not quant dicts); the XLA path
        # dequantizes them with Precision.HIGHEST — keep them there so the
        # stated "no fp8 on the fused path" gating holds.
        if w is not None and w.dtype in (jnp.float8_e4m3fn, jnp.float8_e5m2):
            return False
        if "lora_down" in p or "hada_w1_a" in p:
            return False
    return True


def gated_mlp(
    x: jax.Array,
    w_act: jax.Array,
    w_gate: jax.Array,
    w_down: jax.Array,
    b_act: Optional[jax.Array] = None,
    b_gate: Optional[jax.Array] = None,
    b_down: Optional[jax.Array] = None,
    act: str = "silu",
    interpret: bool = False,
) -> jax.Array:
    """Fused gated feed-forward:
    ``(act(x @ w_act^T + b_act) * (x @ w_gate^T + b_gate)) @ w_down^T +
    b_down`` — without the wide intermediates ever touching HBM.

    ``x``: (..., C); ``w_act``/``w_gate``: (inner, C) torch layout;
    ``w_down``: (C, inner) torch layout; biases optional.
    """
    c = x.shape[-1]
    inner = w_down.shape[1]
    lead = x.shape[:-1]
    x2 = x.reshape(-1, c)
    zi = jnp.zeros((inner,), jnp.float32)
    zc = jnp.zeros((c,), jnp.float32)
    out = _gated_core(
        x2,
        w_act, zi if b_act is None else b_act,
        w_gate, zi if b_gate is None else b_gate,
        w_down, zc if b_down is None else b_down,
        act, interpret, 0, 0,
    )
    return out.reshape(*lead, c)


def geglu_mlp(
    x: jax.Array,
    w1: jax.Array,
    b1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """SDXL GeGLU layout: ``w1`` is the fused (2*inner, C) up-projection
    whose first row half is the linear stream and second half the gelu
    gate (``h * gelu(gate)``), ``w2`` the (C, inner) down projection.
    The fused array is passed for both kernel operands with half-offset
    index maps — no sliced copies in HBM."""
    c = x.shape[-1]
    lead = x.shape[:-1]
    out = _gated_core(
        x.reshape(-1, c),
        w1, b1,          # act operand reads the gate half via off_a=1
        w1, b1,          # gate operand reads the linear half via off_g=0
        w2, b2,
        "gelu_tanh", interpret, 1, 0,
    )
    return out.reshape(*lead, c)


def _geglu_ref(x2, w1, b1, w2, b2):
    """GeGLU oracle in the fused-weight layout (tests)."""
    inner = w2.shape[1]
    return _gated_ref(
        x2, w1[inner:], b1[inner:], w1[:inner], b1[:inner], w2, b2,
        "gelu_tanh",
    )
