"""Pallas TPU fused 4-bit (NF4/FP4) quantized matmul.

The reference's QLoRA path stores bitsandbytes-packed 4-bit base weights
and dequantizes inside CUDA kernels (/root/reference/src/modules/quant/
functional.py:342-371 via bnb.functional.dequantize_4bit). The XLA
analogue (modules/quant/nf4.py dequantize_4bit -> lax.dot) must
MATERIALIZE the dequantized weight as an HBM temp because TPU dot
operands are real buffers: per Linear that is an f32 [numel,2] stack, a
bf16 convert, and the weight-sized operand itself — ~20 bytes of HBM
traffic per weight element and enough live temps to OOM a 16 GB chip on
the SDXL NF4 train step.

This kernel keeps the weight PACKED in HBM (0.5 byte/element + absmax)
and dequantizes (BN, BKh) tiles in VMEM right before the MXU dots:

- bnb packs two codes per byte, even element index in the HIGH nibble.
  Rather than interleave nibbles in-kernel (a lane shuffle Mosaic does
  not love — strided lane extracts and minor-2 reshapes both fail to
  lower), the kernel does two dots per K step against the two nibble
  planes:                            acc += x_A @ lut(hi)^T
                                        + x_B @ lut(lo)^T
  Which x columns feed each plane depends on the byte LAYOUT:
  * ``split=True`` (the device-tree canonical layout, produced once at
    quantize/load time by modules/quant): byte j holds the codes of
    columns j (hi) and k/2+j (lo), so x_A and x_B are CONTIGUOUS
    k-slices of x — two BlockSpec index maps on the same array, zero
    preprocessing. The dx halves likewise concatenate contiguously.
  * ``split=False`` (raw bnb bytes): byte j holds columns 2j/2j+1, so
    the activation K axis is deinterleaved even/odd OUTSIDE the kernel.
    Kept for interop, but the stride-2 lane slice is an extra XLA pass
    over x per call and compiles to a gather fusion whose scoped-VMEM
    stack overflows the 16 MB limit at AuraFlow train shapes — load
    paths should repack (``to_split_layout``) instead.
- the 16-entry codebook rides as a (1, 16) operand (it is a traced param
  leaf under jit, so it cannot be inlined statically); the lookup is a
  15-select chain on the VPU.
- absmax is per 64-element block of the flattened row-major weight; with
  K % 64 == 0 blocks never straddle rows, so a K step needs BKh/32
  consecutive entries per row, expanded to lanes by a tiny iota-mask
  matmul (BN, BKh/32) @ (BKh/32, BKh).
- M blocks are large (up to 2048 rows): the per-(n,k) tile dequant is
  redundant across the M grid dim, so fewer M steps keeps the VPU
  dequant hidden under the MXU.
- f32 accumulation lives in a VMEM scratch; the bf16 output block is
  written once on the last K step.

The backward for x (the base is frozen in QLoRA — packed/absmax get zero
cotangents) contracts over N with the same tile dequant, accumulating
d(x_even)/d(x_odd) halves that are re-interleaved outside.

Shape contract (else callers fall back to the XLA dequant path):
K % 256 == 0, N % 128 == 0, blocksize % 2 == 0, K % blocksize == 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def to_split_layout(packed: np.ndarray, shape: tuple[int, int]) -> np.ndarray:
    """bnb byte layout -> split layout, host-side (one-time at load).

    Input bytes: byte t of a row packs columns (2t, 2t+1) as (hi, lo).
    Output bytes: byte j packs columns (j, k/2+j) as (hi, lo), so each
    nibble plane covers a contiguous half of the K axis. absmax needs no
    change: scales stay indexed by ORIGINAL flat element position.

    bnb pads the flat element array to a 128 multiple before packing;
    those trailing pad bytes carry no real codes and are dropped here
    (the split device layout is always exactly n*k/2 bytes).
    """
    n, k = shape
    if k % 2:
        raise ValueError(f"split layout needs even in_features, got {k}")
    p = np.asarray(packed, np.uint8).reshape(-1)[: n * k // 2].reshape(n, k // 2)
    codes = np.empty((n, k), np.uint8)
    codes[:, 0::2] = p >> 4
    codes[:, 1::2] = p & 0xF
    return (codes[:, : k // 2] << 4) | codes[:, k // 2 :]


def from_split_layout(packed_split: np.ndarray, shape: tuple[int, int]) -> np.ndarray:
    """Inverse of :func:`to_split_layout` (split -> bnb bytes, unpadded:
    any bnb pad bytes were dropped by the forward transform)."""
    n, k = shape
    p = np.asarray(packed_split, np.uint8).reshape(n, k // 2)
    codes = np.concatenate([p >> 4, p & 0xF], axis=1)  # column order
    return (codes[:, 0::2] << 4) | codes[:, 1::2]


def supports(m: int, k: int, n: int, blocksize: int) -> bool:
    """Whether the fused kernel handles this Linear (else XLA dequant)."""
    # blocksize 64 (the bnb default and the only size we write) keeps the
    # lane-expansion granule (blocksize/2 = 32) dividing every BKh choice
    return k % 256 == 0 and n % 128 == 0 and blocksize == 64 and m >= 1


def _pick_blocks(m: int, k: int, n: int) -> tuple[int, int, int]:
    """(BM, BN, BKh): BKh in packed columns (one column = 2 K elements).

    VFT_NF4_BM / VFT_NF4_BN / VFT_NF4_BKH override for geometry sweeps
    (tools/bench/nf4_kernel_bench.py); invalid overrides (non-dividing)
    fall back to the default pick for that dimension."""
    import os

    kh = k // 2
    bkh = 512
    while kh % bkh != 0:
        bkh //= 2
    bn = 256 if n % 256 == 0 else 128
    bm = 2048
    while bm > m and bm > 16:
        bm //= 2
    env_bm = int(os.environ.get("VFT_NF4_BM", 0))
    env_bn = int(os.environ.get("VFT_NF4_BN", 0))
    env_bkh = int(os.environ.get("VFT_NF4_BKH", 0))
    if env_bm > 0:
        bm = env_bm
    if env_bn > 0 and n % env_bn == 0:
        bn = env_bn
    if env_bkh > 0 and kh % env_bkh == 0:
        bkh = env_bkh
    return bm, bn, bkh


def _lut(codes: jax.Array, code_ref) -> jax.Array:
    """codes int32 in [0,16) -> f32 codebook values (15-select chain)."""
    v = jnp.full(codes.shape, code_ref[0, 0], jnp.float32)
    for i in range(1, 16):
        v = jnp.where(codes == i, code_ref[0, i], v)
    return v


def _dequant_tile(p_ref, am_ref, code_ref, half_block: int, kstep):
    """(BN, BKh) packed tile -> bf16 (BN, BKh) even/odd weight tiles.

    ``am_ref`` holds the FULL absmax rows (BN, K/blocksize) — a per-step
    (BN, BKh/half_block) slice would violate the lane-tiling rule and a
    dynamic lane slice is slow, so the K-step selection is folded into
    the iota-mask expansion matmul instead: expand[b, j] is 1 iff global
    block b covers this step's lane j.
    """
    p = p_ref[...].astype(jnp.int32)  # (BN, BKh)
    bkh = p.shape[1]
    hi = _lut(p >> 4, code_ref)
    lo = _lut(p & 0xF, code_ref)
    nb_total = am_ref.shape[1]
    sel_row = lax.broadcasted_iota(jnp.int32, (nb_total, bkh), 0)
    sel_col = lax.broadcasted_iota(jnp.int32, (nb_total, bkh), 1) // half_block
    sel_col = sel_col + kstep * (bkh // half_block)
    expand = (sel_row == sel_col).astype(jnp.float32)
    scale = jnp.dot(am_ref[...], expand, preferred_element_type=jnp.float32)
    return (hi * scale).astype(jnp.bfloat16), (lo * scale).astype(jnp.bfloat16)


def _dequant_tile_split(p_ref, am_ref, code_ref, blocksize: int, kstep):
    """(BN, BKh) split-layout tile -> bf16 (BN, BKh) hi/lo weight tiles.

    Under split layout one byte = one column per nibble plane, so a
    64-element absmax block spans 64 consecutive BYTES of a plane: the hi
    plane's byte g (global) scales by block g//64, the lo plane's by
    nb_half + g//64 (its columns start at k/2). Same iota-mask expansion
    matmul as the bnb path, just two masks.
    """
    p = p_ref[...].astype(jnp.int32)  # (BN, BKh)
    bkh = p.shape[1]
    hi = _lut(p >> 4, code_ref)
    lo = _lut(p & 0xF, code_ref)
    nb_total = am_ref.shape[1]
    nb_half = nb_total // 2
    sel_row = lax.broadcasted_iota(jnp.int32, (nb_total, bkh), 0)
    blk = lax.broadcasted_iota(jnp.int32, (nb_total, bkh), 1) // blocksize
    blk = blk + kstep * (bkh // blocksize)
    exp_hi = (sel_row == blk).astype(jnp.float32)
    exp_lo = (sel_row == blk + nb_half).astype(jnp.float32)
    am = am_ref[...]
    scale_hi = jnp.dot(am, exp_hi, preferred_element_type=jnp.float32)
    scale_lo = jnp.dot(am, exp_lo, preferred_element_type=jnp.float32)
    return (hi * scale_hi).astype(jnp.bfloat16), (lo * scale_lo).astype(jnp.bfloat16)


def _fwd_kernel(xe_ref, xo_ref, p_ref, am_ref, code_ref, o_ref, acc_ref,
                *, nk: int, half_block: int, split: bool = False):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    if split:
        we, wo = _dequant_tile_split(p_ref, am_ref, code_ref, 2 * half_block, ki)
    else:
        we, wo = _dequant_tile(p_ref, am_ref, code_ref, half_block, ki)
    acc_ref[...] += lax.dot_general(
        xe_ref[...], we, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + lax.dot_general(
        xo_ref[...], wo, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ki == nk - 1)
    def _flush():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _dx_kernel(dy_ref, p_ref, am_ref, code_ref, dxe_ref, dxo_ref,
               acc_e_ref, acc_o_ref, *, nn: int, half_block: int,
               split: bool = False):
    ni = pl.program_id(2)

    @pl.when(ni == 0)
    def _zero():
        acc_e_ref[...] = jnp.zeros_like(acc_e_ref)
        acc_o_ref[...] = jnp.zeros_like(acc_o_ref)

    if split:
        we, wo = _dequant_tile_split(
            p_ref, am_ref, code_ref, 2 * half_block, pl.program_id(1)
        )
    else:
        we, wo = _dequant_tile(p_ref, am_ref, code_ref, half_block, pl.program_id(1))
    dy = dy_ref[...]
    acc_e_ref[...] += lax.dot_general(
        dy, we, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    acc_o_ref[...] += lax.dot_general(
        dy, wo, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(ni == nn - 1)
    def _flush():
        dxe_ref[...] = acc_e_ref[...].astype(dxe_ref.dtype)
        dxo_ref[...] = acc_o_ref[...].astype(dxo_ref.dtype)


def _pad_rows(x2d: jax.Array, bm: int) -> jax.Array:
    m = x2d.shape[0]
    pad = (-m) % bm
    return jnp.pad(x2d, ((0, pad), (0, 0))) if pad else x2d


def _fwd_impl(x2d, packed2d, absmax2d, code2d, *, blocksize, interpret,
              split=False):
    m, k = x2d.shape
    n = packed2d.shape[0]
    bm, bn, bkh = _pick_blocks(m, k, n)
    half = blocksize // 2
    nk = (k // 2) // bkh
    if split:
        # both nibble-plane activations are contiguous k-slices of x:
        # the SAME padded array rides in twice with shifted index maps
        xe = xo = _pad_rows(x2d, bm)
        xe_spec = pl.BlockSpec((bm, bkh), lambda i, j, ki: (i, ki))
        xo_spec = pl.BlockSpec((bm, bkh), lambda i, j, ki: (i, nk + ki))
    else:
        xe = _pad_rows(x2d[:, 0::2], bm)
        xo = _pad_rows(x2d[:, 1::2], bm)
        xe_spec = pl.BlockSpec((bm, bkh), lambda i, j, ki: (i, ki))
        xo_spec = pl.BlockSpec((bm, bkh), lambda i, j, ki: (i, ki))
    mp = xe.shape[0]
    grid = (mp // bm, n // bn, nk)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, nk=nk, half_block=half, split=split),
        grid=grid,
        in_specs=[
            xe_spec,
            xo_spec,
            pl.BlockSpec((bn, bkh), lambda i, j, ki: (j, ki)),
            pl.BlockSpec((bn, absmax2d.shape[1]), lambda i, j, ki: (j, 0)),
            pl.BlockSpec((1, 16), lambda i, j, ki: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, ki: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, n), x2d.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        interpret=interpret,
    )(xe, xo, packed2d, absmax2d, code2d)
    return out[:m] if mp != m else out


def _dx_impl(dy2d, packed2d, absmax2d, code2d, *, k, blocksize, dtype, interpret,
             split=False):
    m, n = dy2d.shape
    bm, bn, bkh = _pick_blocks(m, k, n)
    # The dx kernel carries TWO f32 (bm, bkh) accumulators plus the two
    # bf16 output windows — at bkh=512 that is 12 MB before the dequant
    # temporaries and measured 18.25 MB against the 16 MB scoped-VMEM
    # stack on the SDXL/AuraFlow NF4 train steps. Halve the k window
    # (scratch+outputs scale with bkh; the dequant work per K element is
    # unchanged, it just splits across twice the grid steps).
    while bkh > 256 and (k // 2) % (bkh // 2) == 0:
        bkh //= 2
    half = blocksize // 2
    dy = _pad_rows(dy2d, bm)
    mp = dy.shape[0]
    nk = (k // 2) // bkh
    grid = (mp // bm, nk, n // bn)
    dxe, dxo = pl.pallas_call(
        functools.partial(_dx_kernel, nn=n // bn, half_block=half, split=split),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bn), lambda i, ki, j: (i, j)),
            pl.BlockSpec((bn, bkh), lambda i, ki, j: (j, ki)),
            pl.BlockSpec((bn, absmax2d.shape[1]), lambda i, ki, j: (j, 0)),
            pl.BlockSpec((1, 16), lambda i, ki, j: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bm, bkh), lambda i, ki, j: (i, ki)),
            pl.BlockSpec((bm, bkh), lambda i, ki, j: (i, ki)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mp, k // 2), dtype),
            jax.ShapeDtypeStruct((mp, k // 2), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bm, bkh), jnp.float32),
            pltpu.VMEM((bm, bkh), jnp.float32),
        ],
        interpret=interpret,
    )(dy, packed2d, absmax2d, code2d)
    if split:
        # the halves ARE the contiguous column halves of dx
        dx = jnp.concatenate([dxe, dxo], axis=1)
    else:
        dx = jnp.stack([dxe, dxo], axis=-1).reshape(mp, k)
    return dx[:m] if mp != m else dx


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _nf4_matmul2d(x2d, packed2d, absmax2d, code2d, blocksize, interpret, split):
    return _fwd_impl(
        x2d, packed2d, absmax2d, code2d, blocksize=blocksize,
        interpret=interpret, split=split,
    )


def _nf4_fwd(x2d, packed2d, absmax2d, code2d, blocksize, interpret, split):
    y = _fwd_impl(
        x2d, packed2d, absmax2d, code2d, blocksize=blocksize,
        interpret=interpret, split=split,
    )
    return y, (packed2d, absmax2d, code2d, jnp.zeros((0,), x2d.dtype))


def _nf4_bwd(blocksize, interpret, split, res, dy):
    packed2d, absmax2d, code2d, dtype_token = res
    k = packed2d.shape[1] * 2
    dtype = dtype_token.dtype
    dx = _dx_impl(
        dy.astype(dtype), packed2d, absmax2d, code2d,
        k=k, blocksize=blocksize, dtype=dtype, interpret=interpret, split=split,
    )
    zero_packed = np.zeros(packed2d.shape, jax.dtypes.float0)
    return (dx, zero_packed, jnp.zeros_like(absmax2d), jnp.zeros_like(code2d))


_nf4_matmul2d.defvjp(_nf4_fwd, _nf4_bwd)


def nf4_matmul(
    x: jax.Array,
    packed: jax.Array,
    code: jax.Array,
    absmax: jax.Array,
    shape: tuple[int, int],
    blocksize: int = 64,
    interpret: bool = False,
    split: bool = False,
) -> jax.Array:
    """x @ W^T with W stored packed 4-bit; returns (..., out_features).

    ``packed`` is ((numel+1)//2, 1) uint8 — bnb byte order, or the split
    device layout (:func:`to_split_layout`) when ``split=True`` (the fast
    path: no activation deinterleave). ``absmax`` is the flat f32
    per-block scales (already un-double-quantized), ``code`` the 16-entry
    codebook, ``shape`` the logical (out_features, in_features). Callers
    must check :func:`supports` first.
    """
    n, k = shape
    lead = x.shape[:-1]
    m = int(np.prod(lead)) if lead else 1
    x2d = x.reshape(m, k)
    packed2d = packed.reshape(n, k // 2)
    absmax2d = absmax.astype(jnp.float32).reshape(n, k // blocksize)
    code2d = code.astype(jnp.float32).reshape(1, 16)
    y = _nf4_matmul2d(x2d, packed2d, absmax2d, code2d, blocksize, interpret,
                      split)
    return y.reshape(*lead, n)
