"""Pallas TPU flash attention (fwd + bwd).

The TPU-native replacement for every flash-attn / xformers call site in
the reference (/root/reference/src/modules/attention.py:131-157): blockwise
online-softmax attention that never materializes the (Sq, Sk) logits in
HBM, with a custom-VJP backward that recomputes probabilities from the
saved logsumexp rows (flash-attention-2 style).

Design (sized for image-diffusion workloads — Sq, Sk <= ~8k):
- Grid (B*H, Sq/BLOCK_Q); each program holds one q block and streams the
  FULL K/V for its (batch, head) through VMEM in BLOCK_K chunks via
  fori_loop (whole K/V for 4k tokens x 128 dim bf16 is ~2 MB — resident).
- fp32 accumulation and softmax stats; bf16 matmul inputs on the MXU.
- Sequence padding to block multiples is masked *statically* (iota vs the
  true length — no mask tensor for the common unmasked case). Explicit
  key masks (padding / Lumina2 variable-length captions) become an fp32
  additive-bias row stored 8x sublane-replicated to satisfy the (8, 128)
  VMEM tile rule.
- head_dim padded to 128 lanes in the wrapper; padded q rows sliced off.

K/V are block-streamed so a ring/context-parallel axis can be added later
(SURVEY.md §5.7).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

BLOCK_Q = 512
BLOCK_K = 1024
NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _divisor_block_k(sk: int) -> int:
    """K block size. DEFAULT: the legacy round-up choice (big blocks,
    k/v padded in HBM when the key length doesn't divide) — the r4
    on-chip A/Bs showed the sk-dividing small blocks costing far more in
    kernel efficiency than the pads they saved (Lumina2 train 2951.8 ->
    3313.1 ms with divisor blocks + unpadded q; generate +5% with 128
    blocks). VFT_FLASH_DIVISOR_K=1 re-enables largest-divisor selection
    (no k/v pads); VFT_FLASH_BLOCK_K forces an exact size (A/B lever)."""
    forced = os.environ.get("VFT_FLASH_BLOCK_K")
    if forced:
        return int(forced)
    legacy = min(BLOCK_K, _round_up(sk, 128))
    if sk % legacy == 0:  # SDXL 4096/1024: unchanged either way
        return legacy
    if os.environ.get("VFT_FLASH_DIVISOR_K", "0") == "1":
        for c in (BLOCK_K, 512, 256, 128):
            if sk % c == 0:
                return c
    return legacy


def _masked_scores(s, kb, qi, block_q, kmask_row, *, causal, sk_actual, sk_pad):
    """Apply static padding mask, optional bias row, optional causal."""
    block_k = s.shape[1]
    k_pos = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    if sk_actual < sk_pad:
        s = jnp.where(k_pos < sk_actual, s, NEG_INF)
    if kmask_row is not None:
        s = s + kmask_row[None, :]
    if causal:
        q_pos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        s = jnp.where(k_pos <= q_pos, s, NEG_INF)
    return s


# ---------------------------------------------------------------------------
# forward


def _fwd_kernel(*refs, scale, causal, sk_actual, sk_pad, has_bias, block_k, vones, d):
    """vones: V gets a ones column appended IN-KERNEL (lane d), so the PV
    matmul accumulates the softmax row-sum l on the MXU for free (the lanes
    past head_dim were idle anyway for d<128 heads); the separate VPU
    jnp.sum pass disappears. Building the column per block instead of in
    HBM (the old v_aug pad+add) deletes a full V-sized HBM copy per call
    plus the 128->d lane slice of the output. vones False: classic l carry."""
    if has_bias:
        q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref = refs
    else:
        q_ref, k_ref, v_ref, o_ref, lse_ref = refs
    q = q_ref[0]  # (BQ, D) native dtype -> MXU bf16 path
    block_q = q.shape[0]
    qi = pl.program_id(1)
    num_kb = sk_pad // block_k
    dv = d + 1 if vones else d

    def step(kb, acc, m_i, l_i):
        k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :]
        if vones:
            v_blk = jnp.concatenate(
                [v_blk, jnp.ones((v_blk.shape[0], 1), v_blk.dtype)], axis=1
            )
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (BQ, BK) fp32
        bias_row = (
            bias_ref[0, 0, pl.ds(kb * block_k, block_k)] if has_bias else None
        )
        s = _masked_scores(
            s, kb, qi, block_q, bias_row,
            causal=causal, sk_actual=sk_actual, sk_pad=sk_pad,
        )
        m_new = jnp.maximum(m_i, jnp.max(s, axis=1))
        p = jnp.exp(s - m_new[:, None])
        alpha = jnp.exp(m_i - m_new)
        if not vones:
            l_i = l_i * alpha + jnp.sum(p, axis=1)
        acc = acc * alpha[:, None] + jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        return acc, m_new, l_i

    # 2x unroll: the second iteration's QK dot (MXU) is independent of the
    # first's softmax (VPU), letting Mosaic overlap the units (measured
    # 1.14 -> 1.06 ms on the 20x4096x64 SDXL shape)
    unroll = 2 if num_kb % 2 == 0 and num_kb >= 2 else 1

    def body(i, carry):
        acc, m_i, l_i = carry
        if unroll == 2:
            acc, m_i, l_i = step(2 * i, acc, m_i, l_i)
            acc, m_i, l_i = step(2 * i + 1, acc, m_i, l_i)
        else:
            acc, m_i, l_i = step(i, acc, m_i, l_i)
        return acc, m_i, l_i

    acc = jnp.zeros((block_q, dv), jnp.float32)
    m_i = jnp.full((block_q,), NEG_INF, jnp.float32)
    l_i = jnp.zeros((block_q,), jnp.float32)
    acc, m_i, l_i = jax.lax.fori_loop(0, num_kb // unroll, body, (acc, m_i, l_i))

    if vones:
        l_i = acc[:, d]
        acc = acc[:, :d]
    l_safe = jnp.maximum(l_i, 1e-30)
    o_ref[0] = (acc / l_safe[:, None]).astype(o_ref.dtype)
    lse = m_i + jnp.log(l_safe)
    lse_ref[0] = jnp.broadcast_to(lse[None, :], (8, block_q))


def _bias_spec(sk_pad):
    return pl.BlockSpec((1, 8, sk_pad), lambda bh, i: (bh, 0, 0))


def _flash_fwd(q, k, v, bias, scale, causal, sk_actual, block_q, block_k, interpret):
    b, h, sq, d = q.shape
    sk_pad = k.shape[2]
    # ceil: the final q block may be partial (Mosaic masks the boundary;
    # garbage rows are row-isolated through the softmax and dropped on
    # the masked store)
    grid = (b * h, -(-sq // block_q))
    has_bias = bias is not None

    # V-ones: when head_dim leaves idle lanes below the next 128 boundary
    # (d % 128 != 0), the kernel appends a ones column to each V block so
    # the PV matmul accumulates the softmax row-sum for free. For
    # d % 128 == 0 the extra lane pass would double PV time — classic l.
    vones = d % 128 != 0

    kernel = functools.partial(
        _fwd_kernel, scale=scale, causal=causal,
        sk_actual=sk_actual, sk_pad=sk_pad, has_bias=has_bias, block_k=block_k,
        vones=vones, d=d,
    )
    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0)),
        pl.BlockSpec((1, sk_pad, d), lambda bh, qi: (bh, 0, 0)),
        pl.BlockSpec((1, sk_pad, d), lambda bh, qi: (bh, 0, 0)),
    ]
    args = [
        q.reshape(b * h, sq, d),
        k.reshape(b * h, sk_pad, d),
        v.reshape(b * h, sk_pad, d),
    ]
    if has_bias:
        in_specs.append(_bias_spec(sk_pad))
        args.append(bias)

    o, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0)),
            pl.BlockSpec((1, 8, block_q), lambda bh, qi: (bh, 0, qi)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, sq, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, 8, sq), jnp.float32),
        ],
        interpret=interpret,
    )(*args)
    return o.reshape(b, h, sq, d), lse  # lse (b*h, 8, sq) replicated


# ---------------------------------------------------------------------------
# backward


def _bwd_dq_kernel(*refs, scale, causal, sk_actual, sk_pad, has_bias, block_k):
    if has_bias:
        q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, delta_ref, dq_ref = refs
    else:
        q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref = refs
    q = q_ref[0]
    do = do_ref[0]
    lse = lse_ref[0, 0]
    delta = delta_ref[0, 0]
    block_q = q.shape[0]
    qi = pl.program_id(1)
    num_kb = sk_pad // block_k

    def body(kb, dq):
        k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        bias_row = (
            bias_ref[0, 0, pl.ds(kb * block_k, block_k)] if has_bias else None
        )
        s = _masked_scores(
            s, kb, qi, block_q, bias_row,
            causal=causal, sk_actual=sk_actual, sk_pad=sk_pad,
        )
        p = jnp.exp(s - lse[:, None])
        dp = jax.lax.dot_general(
            do, v_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = (p * (dp - delta[:, None]) * scale).astype(k_blk.dtype)
        return dq + jax.lax.dot_general(
            ds, k_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    unroll = _bwd_unroll(num_kb, block_q, block_k, q.shape[1])

    def unrolled(i, dq):
        if unroll == 2:
            return body(2 * i + 1, body(2 * i, dq))
        return body(i, dq)

    dq = jnp.zeros(q.shape, jnp.float32)
    dq = jax.lax.fori_loop(0, num_kb // unroll, unrolled, dq)
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel(*refs, scale, causal, sq_actual, sq_pad, sk_actual,
                    sk_pad, has_bias, block_q, fuse_dq=False):
    """BHSD backward dk/dv pass; with ``fuse_dq`` it is the one-pass
    backward: dq accumulates into a grid-persistent f32 output (see
    _bwd_dkvq_kernel_bshd — same trick: the dq block's index map is
    constant in the sequential ki grid dim, so it stays in VMEM and
    flushes once per (batch, head)). Fusion is used when the f32 dq
    block fits scoped VMEM (_FUSE_DQ_MAX); the two-pass path remains for
    large sq*d (d=256 heads)."""
    if has_bias:
        (q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, delta_ref,
         dk_ref, dv_ref, *dq_refs) = refs
    else:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
         dk_ref, dv_ref, *dq_refs) = refs
    dq_ref = dq_refs[0] if fuse_dq else None
    k_blk = k_ref[0]  # (BK, D) native dtype
    v_blk = v_ref[0]
    block_k = k_blk.shape[0]
    ki = pl.program_id(1)
    num_qb = sq_pad // block_q
    bias_row = bias_ref[0, 0, pl.ds(ki * block_k, block_k)] if has_bias else None

    if fuse_dq:
        @pl.when(ki == 0)
        def _zero_dq():
            dq_ref[...] = jnp.zeros_like(dq_ref)

    def body(qb, carry):
        dk, dv = carry
        q_blk = q_ref[0, pl.ds(qb * block_q, block_q), :]
        do_blk = do_ref[0, pl.ds(qb * block_q, block_q), :]
        lse_blk = lse_ref[0, 0, pl.ds(qb * block_q, block_q)]
        delta_blk = delta_ref[0, 0, pl.ds(qb * block_q, block_q)]
        s = jax.lax.dot_general(
            q_blk, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (BQ, BK)
        # note: ki/qb swap roles vs the dq kernel in _masked_scores.
        # Padding masks are built only when padding exists (sk_actual <
        # sk_pad etc.) — on the block-aligned train shapes the iota+where
        # passes are pure VPU overhead in the hot loop.
        if sk_actual < sk_pad or causal:
            k_pos = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            if sk_actual < sk_pad:
                s = jnp.where(k_pos < sk_actual, s, NEG_INF)
        if bias_row is not None:
            s = s + bias_row[None, :]
        if causal or sq_actual < sq_pad:
            q_pos = qb * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        if causal:
            s = jnp.where(k_pos <= q_pos, s, NEG_INF)
        p = jnp.exp(s - lse_blk[:, None])
        if sq_actual < sq_pad:
            # zero padded q rows (their lse is garbage)
            p = jnp.where(q_pos < sq_actual, p, 0.0)
        dv = dv + jax.lax.dot_general(
            p.astype(do_blk.dtype), do_blk,
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do_blk, v_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = (p * (dp - delta_blk[:, None]) * scale).astype(q_blk.dtype)
        dk = dk + jax.lax.dot_general(
            ds, q_blk, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        if fuse_dq:
            dqb = jax.lax.dot_general(
                ds, k_blk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            qs = pl.ds(qb * block_q, block_q)
            dq_ref[0, qs, :] = dq_ref[0, qs, :] + dqb
        return dk, dv

    unroll = _bwd_unroll(num_qb, block_q, block_k, k_blk.shape[1])
    if fuse_dq and sq_pad * k_blk.shape[1] * 4 > 2 * 1024 * 1024:
        unroll = 1  # leave headroom for the persistent dq block

    def unrolled(i, carry):
        if unroll == 2:
            return body(2 * i + 1, body(2 * i, carry))
        return body(i, carry)

    dk = jnp.zeros(k_blk.shape, jnp.float32)
    dv = jnp.zeros(v_blk.shape, jnp.float32)
    dk, dv = jax.lax.fori_loop(0, num_qb // unroll, unrolled, (dk, dv))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


# fuse dq into the dkv pass only while its f32 accumulator block leaves
# room for the loop temporaries in the 16 MB scoped-VMEM stack
_FUSE_DQ_MAX = 2_621_440  # bytes: sq_pad * d_pad * 4


def _bwd_block_cap() -> int:
    """Backward block cap, scaled to the scoped-VMEM budget.

    Default 512 fits the stock 16 MB scoped-VMEM stack (~14 B of f32/bf16
    temporaries per score element per in-flight body: s, p, dp, ds).
    Running with XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=N and
    VFT_SCOPED_VMEM_KIB=N lets the cap grow with the actual budget
    (an A/B lever: bigger k-blocks mean fewer full passes over Q/dO)."""
    kib = int(os.environ.get("VFT_SCOPED_VMEM_KIB", "16384"))
    return 512 * max(1, kib // 16384)


def _bwd_blocks(block_q, block_k, sq_pad, sk_pad):
    cap = _bwd_block_cap()
    if block_q > cap and sq_pad % cap == 0:
        block_q = cap
    if block_k > cap and sk_pad % cap == 0:
        block_k = cap
    return block_q, block_k


# max score-block elements for which the 2x-unrolled bwd body fits the
# VMEM stack alongside the double-buffered operand blocks
_UNROLL_MAX_BLOCK = 512 * 512


def _bwd_unroll(num_blocks: int, block_q: int, block_k: int, d: int) -> int:
    """2x unroll when the doubled live temporaries still fit scoped VMEM.
    The block slices scale with the lane width d: at d=256 the unrolled
    dkv body measured 16.05 MB of 16 MB (compile OOM), at d<=128 it
    fits."""
    budget = _UNROLL_MAX_BLOCK * (_bwd_block_cap() // 512)
    fits = block_q * block_k * max(1, d // 128) <= budget
    return 2 if num_blocks % 2 == 0 and num_blocks >= 2 and fits else 1


def _flash_bwd(q, k, v, bias, o, lse, do, scale, causal, sq_actual, sk_actual,
               block_q, block_k, interpret, g_lse=None):
    b, h, sq, d = q.shape  # q arrives UNPADDED on the seq axis (phase B)
    sk_pad = k.shape[2]
    block_q, block_k = _bwd_blocks(block_q, block_k, sq, sk_pad)
    # the dkv kernel slices the whole-sequence q/dO window in-kernel, so
    # block_q must divide the window: prefer a dividing block (no copies
    # — Lumina2's 4352 takes 256); only pad rows when none exists
    if sq % block_q != 0:
        bq_div = next(
            (c for c in (512, 256, 128) if c <= block_q and sq % c == 0), None
        )
        if bq_div is not None:
            block_q = bq_div
    sq_pad = _round_up(sq, block_q)
    has_bias = bias is not None
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    if g_lse is not None:
        # Cotangent w.r.t. the returned logsumexp rows. d(lse_i)/d(s_ij) is
        # the softmax probability p_ij, so the lse contribution to ds is
        # p * g_lse — which folds into the existing kernels as a shift of
        # delta: ds = p * (dp - (delta - g_lse)) * scale. No kernel change.
        delta = delta - g_lse.astype(jnp.float32)

    q_ = q.reshape(b * h, sq, d)
    k_ = k.reshape(b * h, sk_pad, d)
    v_ = v.reshape(b * h, sk_pad, d)
    do_ = do.reshape(b * h, sq, d)
    lse_ = lse  # (b*h, 8, sq) sublane-replicated
    delta_ = jnp.broadcast_to(
        delta.reshape(b * h, 1, sq), (b * h, 8, sq)
    )
    if sq_pad != sq:
        rows = sq_pad - sq
        q_ = jnp.pad(q_, ((0, 0), (0, rows), (0, 0)))
        do_ = jnp.pad(do_, ((0, 0), (0, rows), (0, 0)))
        lse_ = jnp.pad(lse_, ((0, 0), (0, 0), (0, rows)))
        delta_ = jnp.pad(delta_, ((0, 0), (0, 0), (0, rows)))

    fuse_dq = sq_pad * d * 4 <= _FUSE_DQ_MAX
    if not fuse_dq:
        dq_specs = [
            pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0)),
            pl.BlockSpec((1, sk_pad, d), lambda bh, qi: (bh, 0, 0)),
            pl.BlockSpec((1, sk_pad, d), lambda bh, qi: (bh, 0, 0)),
        ]
        dq_args = [q_, k_, v_]
        if has_bias:
            dq_specs.append(_bias_spec(sk_pad))
            dq_args.append(bias)
        dq_specs += [
            pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0)),
            pl.BlockSpec((1, 8, block_q), lambda bh, qi: (bh, 0, qi)),
            pl.BlockSpec((1, 8, block_q), lambda bh, qi: (bh, 0, qi)),
        ]
        dq_args += [do_, lse_, delta_]

        dq = pl.pallas_call(
            functools.partial(
                _bwd_dq_kernel, scale=scale, causal=causal,
                sk_actual=sk_actual, sk_pad=sk_pad, has_bias=has_bias,
                block_k=block_k,
            ),
            grid=(b * h, sq_pad // block_q),
            in_specs=dq_specs,
            out_specs=pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0)),
            out_shape=jax.ShapeDtypeStruct((b * h, sq_pad, d), q.dtype),
            interpret=interpret,
        )(*dq_args)

    dkv_specs = [
        pl.BlockSpec((1, sq_pad, d), lambda bh, ki: (bh, 0, 0)),
        pl.BlockSpec((1, block_k, d), lambda bh, ki: (bh, ki, 0)),
        pl.BlockSpec((1, block_k, d), lambda bh, ki: (bh, ki, 0)),
    ]
    dkv_args = [q_, k_, v_]
    if has_bias:
        dkv_specs.append(_bias_spec(sk_pad))
        dkv_args.append(bias)
    dkv_specs += [
        pl.BlockSpec((1, sq_pad, d), lambda bh, ki: (bh, 0, 0)),
        pl.BlockSpec((1, 8, sq_pad), lambda bh, ki: (bh, 0, 0)),
        pl.BlockSpec((1, 8, sq_pad), lambda bh, ki: (bh, 0, 0)),
    ]
    dkv_args += [do_, lse_, delta_]

    if fuse_dq:
        dk, dv, dq_f32 = pl.pallas_call(
            functools.partial(
                _bwd_dkv_kernel, scale=scale, causal=causal,
                sq_actual=sq_actual, sq_pad=sq_pad, sk_actual=sk_actual,
                sk_pad=sk_pad, has_bias=has_bias, block_q=block_q, fuse_dq=True,
            ),
            grid=(b * h, sk_pad // block_k),
            in_specs=dkv_specs,
            out_specs=[
                pl.BlockSpec((1, block_k, d), lambda bh, ki: (bh, ki, 0)),
                pl.BlockSpec((1, block_k, d), lambda bh, ki: (bh, ki, 0)),
                # constant in ki: persistent f32 dq accumulator
                pl.BlockSpec((1, sq_pad, d), lambda bh, ki: (bh, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b * h, sk_pad, d), k.dtype),
                jax.ShapeDtypeStruct((b * h, sk_pad, d), v.dtype),
                jax.ShapeDtypeStruct((b * h, sq_pad, d), jnp.float32),
            ],
            interpret=interpret,
        )(*dkv_args)
        dq = dq_f32.astype(q.dtype)
    else:
        dk, dv = pl.pallas_call(
            functools.partial(
                _bwd_dkv_kernel, scale=scale, causal=causal,
                sq_actual=sq_actual, sq_pad=sq_pad, sk_actual=sk_actual,
                sk_pad=sk_pad, has_bias=has_bias, block_q=block_q,
            ),
            grid=(b * h, sk_pad // block_k),
            in_specs=dkv_specs,
            out_specs=[
                pl.BlockSpec((1, block_k, d), lambda bh, ki: (bh, ki, 0)),
                pl.BlockSpec((1, block_k, d), lambda bh, ki: (bh, ki, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b * h, sk_pad, d), k.dtype),
                jax.ShapeDtypeStruct((b * h, sk_pad, d), v.dtype),
            ],
            interpret=interpret,
        )(*dkv_args)

    if sq_pad != sq:
        dq = dq[:, :sq]
    return (
        dq.reshape(b, h, sq, d),
        dk.reshape(b, h, sk_pad, d),
        dv.reshape(b, h, sk_pad, d),
    )


# ---------------------------------------------------------------------------
# public entry (padding + custom vjp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10, 11))
def _flash_attention_core(
    q, k, v, bias, scale, causal, sq_actual, sk_actual, block_q, block_k, interpret,
    tag_qkv=True,
):
    o, _ = _flash_fwd(q, k, v, bias, scale, causal, sk_actual, block_q, block_k, interpret)
    return o


def _core_fwd(
    q, k, v, bias, scale, causal, sq_actual, sk_actual, block_q, block_k, interpret,
    tag_qkv=True,
):
    from jax.ad_checkpoint import checkpoint_name

    o, lse = _flash_fwd(q, k, v, bias, scale, causal, sk_actual, block_q, block_k, interpret)
    # named so nn.core.remat_layer's policy can SAVE the kernel outputs
    # instead of re-running the forward kernel in the backward pass
    o = checkpoint_name(o, "flash_out")
    lse = checkpoint_name(lse, "flash_lse")
    # the kernel's OTHER residuals: saving them skips rematerializing the
    # q/k/v projection dots feeding the attention in the backward pass.
    # tag_qkv=False lets a GQA caller tag its own PRE-repeat k/v instead
    # (1/num_repeats the bytes); the backward then recomputes just the
    # cheap repeat from the smaller saves (models/lumina2/denoiser.py).
    if tag_qkv:
        q = checkpoint_name(q, "flash_qkv")
        k = checkpoint_name(k, "flash_qkv")
        v = checkpoint_name(v, "flash_qkv")
    return o, (q, k, v, bias, o, lse)


def _core_bwd(scale, causal, sq_actual, sk_actual, block_q, block_k, interpret,
              tag_qkv, residuals, g):
    q, k, v, bias, o, lse = residuals
    dq, dk, dv = _flash_bwd(
        q, k, v, bias, o, lse, g, scale, causal, sq_actual, sk_actual,
        block_q, block_k, interpret,
    )
    return dq, dk, dv, None


_flash_attention_core.defvjp(_core_fwd, _core_bwd)


def flash_attention_tpu(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    is_causal: bool = False,
    interpret: bool = False,
    tag_qkv: bool = True,
) -> jax.Array:
    """Flash attention over (B, H, Sq, D).

    ``mask``: optional boolean key mask, broadcastable from (B, Sk)
    (True = attend). Full (B, H, Sq, Sk) masks are not supported here —
    the dispatcher falls back to the XLA path for those.

    ``tag_qkv=False`` skips the kernel-internal ``flash_qkv``
    checkpoint-name tags so a GQA caller can tag its own pre-repeat
    tensors instead (see nn.core.remat_layer).
    """
    b, h, sq, d = q.shape
    sk = k.shape[2]
    if scale is None:
        scale = d**-0.5

    # head_dim stays unpadded when tileable — Mosaic pads the VMEM lane
    # tiles implicitly, so materializing a 128-lane q/k/v in HBM (2x
    # traffic for SDXL's d=64) buys nothing
    d_pad = d if d % 8 == 0 else _round_up(d, 128)
    # short sequences: one q block per (batch, head) amortizes per-program
    # overhead (s=1024: 0.174 -> 0.165 ms measured on v5e); the score
    # block tops out at 1024x1024 fp32 = 4 MB VMEM
    block_q = _round_up(sq, 128) if sq <= 1024 else min(BLOCK_Q, _round_up(sq, 128))
    # q padding. DEFAULT: legacy round-up (the r4 A/Bs measured the
    # unpadded-q geometry slower overall — its backward needs an
    # sq-dividing block, and the resulting small-M dots cost more than
    # the pads they saved). VFT_FLASH_PARTIAL_Q=1 opts into the partial
    # final grid block (Mosaic-masked, probe-verified exact).
    # k/v pad only to the next 128 when the key length is not 128-aligned
    # (v pad rows must be zero: p=0 does not protect the PV dot from
    # garbage v).
    partial_q = os.environ.get("VFT_FLASH_PARTIAL_Q", "0") == "1"
    sq_pad = sq if partial_q else _round_up(sq, block_q)
    sk_pad = sk if sk % 128 == 0 else _round_up(sk, 128)
    block_k = _divisor_block_k(sk_pad)
    sk_pad = _round_up(sk_pad, block_k)  # no-op unless block_k was forced

    def pad(x, s_pad):
        return jnp.pad(x, ((0, 0), (0, 0), (0, s_pad - x.shape[2]), (0, d_pad - d)))

    qp, kp, vp = pad(q, sq_pad), pad(k, sk_pad), pad(v, sk_pad)

    bias = None
    if mask is not None:
        key_mask = jnp.broadcast_to(jnp.asarray(mask, bool).reshape(-1, sk), (b, sk))
        key_mask = jnp.pad(key_mask, ((0, 0), (0, sk_pad - sk)))
        row = jnp.where(key_mask, 0.0, NEG_INF).astype(jnp.float32)  # (b, sk_pad)
        # (B*H, 8, sk_pad): head-broadcast + 8x sublane replication for the
        # (8, 128) VMEM tile rule
        bias = jnp.broadcast_to(row[:, None, None, :], (b, h, 8, sk_pad)).reshape(
            b * h, 8, sk_pad
        )

    out = _flash_attention_core(
        qp, kp, vp, bias, scale, is_causal, sq, sk, block_q, block_k, interpret,
        tag_qkv,
    )
    return out[:, :, :sq, :d]


# ---------------------------------------------------------------------------
# BSHD ("heads-packed") entry — attention straight from (B, S, H*D)
#
# The denoiser projections produce (B, S, H*D); the classic path transposes
# to (B, H, S, D) and back, and those two HBM copies (plus the transpose
# XLA fuses into the out-projection) cost ~7 ms/step on the SDXL bench.
# Here the kernel addresses the (B, S, H*D) array directly: each program
# owns a 128-lane-aligned *head group* (two d=64 heads, or one d=128 head)
# selected by the grid's middle axis, so every block offset is a whole
# lane tile and no relayout ever hits HBM.


def _fwd_kernel_bshd(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, causal,
                     sk_actual, sk_pad, block_k, group, d):
    """refs: q/o (1, BQ, G*d), k/v (1, SK_pad, G*d), lse (1, 1, G*8, BQ)."""
    q = q_ref[0]  # (BQ, G*d)
    block_q = q.shape[0]
    qi = pl.program_id(2)
    num_kb = sk_pad // block_k

    # d % 128 != 0 leaves idle MXU lanes in the PV dot: append a ones
    # column to V in-kernel so the softmax row-sum l accumulates on the
    # MXU for free (same V-ones trick as the BHSD kernel, built per block
    # instead of in HBM since the packed layout can't carry it)
    vones = d % 128 != 0
    dv = d + 1 if vones else d

    def step(kb, carry):
        accs, ms, ls = carry
        k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :]  # (BK, G*d)
        v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :]
        new_accs, new_ms, new_ls = [], [], []
        # the G head chains are independent: their MXU dots and VPU
        # softmaxes interleave (same overlap the 2x K-unroll bought the
        # BHSD kernel)
        for g in range(group):
            qg = q[:, g * d:(g + 1) * d]
            kg = k_blk[:, g * d:(g + 1) * d]
            vg = v_blk[:, g * d:(g + 1) * d]
            if vones:
                vg = jnp.concatenate(
                    [vg, jnp.ones((vg.shape[0], 1), vg.dtype)], axis=1
                )
            s = jax.lax.dot_general(
                qg, kg, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            s = _masked_scores(
                s, kb, qi, block_q, None,
                causal=causal, sk_actual=sk_actual, sk_pad=sk_pad,
            )
            m_new = jnp.maximum(ms[g], jnp.max(s, axis=1))
            p = jnp.exp(s - m_new[:, None])
            alpha = jnp.exp(ms[g] - m_new)
            l_new = ls[g] if vones else ls[g] * alpha + jnp.sum(p, axis=1)
            acc = accs[g] * alpha[:, None] + jax.lax.dot_general(
                p.astype(vg.dtype), vg,
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )
            new_accs.append(acc)
            new_ms.append(m_new)
            new_ls.append(l_new)
        return tuple(new_accs), tuple(new_ms), tuple(new_ls)

    # 2x K-unroll on top of the head interleave (same MXU/VPU overlap win
    # as the BHSD kernel's unroll)
    unroll = 2 if num_kb % 2 == 0 and num_kb >= 2 else 1

    def body(i, carry):
        if unroll == 2:
            return step(2 * i + 1, step(2 * i, carry))
        return step(i, carry)

    init = (
        tuple(jnp.zeros((block_q, dv), jnp.float32) for _ in range(group)),
        tuple(jnp.full((block_q,), NEG_INF, jnp.float32) for _ in range(group)),
        tuple(jnp.zeros((block_q,), jnp.float32) for _ in range(group)),
    )
    accs, ms, ls = jax.lax.fori_loop(0, num_kb // unroll, body, init)

    outs = []
    for g in range(group):
        l_g = accs[g][:, d] if vones else ls[g]
        l_safe = jnp.maximum(l_g, 1e-30)
        outs.append(accs[g][:, :d] / l_safe[:, None])
        lse_ref[0, 0, pl.ds(8 * g, 8)] = jnp.broadcast_to(
            (ms[g] + jnp.log(l_safe))[None, :], (8, block_q)
        )
    o_ref[0] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)


def _flash_fwd_bshd(q, k, v, scale, causal, sk_actual, block_q, block_k,
                    group, d, interpret):
    b, sq_pad, inner = q.shape
    sk_pad = k.shape[1]
    hg = inner // (group * d)
    # ceil: partial final q block (Mosaic-masked, probe-verified)
    grid = (b, hg, -(-sq_pad // block_q))
    gd = group * d

    kernel = functools.partial(
        _fwd_kernel_bshd, scale=scale, causal=causal,
        sk_actual=sk_actual, sk_pad=sk_pad, block_k=block_k,
        group=group, d=d,
    )
    o, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, gd), lambda b, g, qi: (b, qi, g)),
            pl.BlockSpec((1, sk_pad, gd), lambda b, g, qi: (b, 0, g)),
            pl.BlockSpec((1, sk_pad, gd), lambda b, g, qi: (b, 0, g)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, gd), lambda b, g, qi: (b, qi, g)),
            pl.BlockSpec((1, 1, group * 8, block_q), lambda b, g, qi: (b, g, 0, qi)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, sq_pad, inner), q.dtype),
            jax.ShapeDtypeStruct((b, hg, group * 8, sq_pad), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)
    return o, lse


def bshd_group(num_heads: int, head_dim: int) -> int:
    """Lane-aligned head-group size for the BSHD kernel; 0 = unsupported
    (caller should use the transposing BHSD path)."""
    if head_dim % 128 == 0:
        return 1
    if head_dim == 64 and num_heads % 2 == 0:
        return 2
    return 0


def flash_attention_bshd(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    scale: Optional[float] = None,
    is_causal: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Flash attention over heads-packed (B, S, H*D) tensors — no head
    transposes anywhere. Supported when ``bshd_group(H, D) > 0``; no mask
    support (masked/odd cases take the BHSD path)."""
    b, sq, inner = q.shape
    sk = k.shape[1]
    d = inner // num_heads
    group = bshd_group(num_heads, d)
    assert group > 0, "unsupported head layout for BSHD kernel"
    if scale is None:
        scale = d**-0.5

    block_q = _round_up(sq, 128) if sq <= 1024 else min(BLOCK_Q, _round_up(sq, 128))
    # q padded by default; VFT_FLASH_PARTIAL_Q=1 opts into the
    # unpadded partial final grid block (see flash_attention_tpu)
    partial_q = os.environ.get("VFT_FLASH_PARTIAL_Q", "0") == "1"
    sq_pad = sq if partial_q else _round_up(sq, block_q)
    sk_pad = sk if sk % 128 == 0 else _round_up(sk, 128)
    block_k = _divisor_block_k(sk_pad)
    sk_pad = _round_up(sk_pad, block_k)  # no-op unless block_k was forced

    def pad_s(x, s_pad):
        return jnp.pad(x, ((0, 0), (0, s_pad - x.shape[1]), (0, 0)))

    o = _flash_bshd_core(
        pad_s(q, sq_pad), pad_s(k, sk_pad), pad_s(v, sk_pad),
        scale, is_causal, sq, sk, block_q, block_k, group, d, interpret,
    )
    return o[:, :sq, :]


def _bwd_dkvq_kernel_bshd(*refs, scale, causal, sq_actual,
                          sq_pad, sk_actual, sk_pad, block_q, group, d, fuse_dq):
    """Backward dk/dv for this k block; with ``fuse_dq`` also this block's
    dq contributions accumulated into a grid-persistent f32 output.

    The separate dq kernel recomputes the same s = QK^T and dp = dO V^T
    blocks the dkv kernel already materializes — 7 S^2 d matmuls across
    the two passes where 5 suffice. The TPU grid runs its innermost dim
    (ki) sequentially, and dq_ref's index map is constant in ki, so the
    block lives in VMEM across all k blocks and flushes once per (b, g):
    a cross-grid-step accumulator (zeroed at ki == 0). The fused form
    only fits scoped VMEM when the persistent sq_pad x (G*d) f32 block is
    small enough (_FUSE_DQ_MAX); past that (e.g. AuraFlow's d=256 heads
    at 4608 tokens: 20.6 MB of kernel stack, on-chip compile OOM) the
    two-pass split runs instead."""
    if fuse_dq:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
         dk_ref, dv_ref, dq_ref) = refs
    else:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
         dk_ref, dv_ref) = refs
    k_all = k_ref[0]  # (BK, G*d)
    v_all = v_ref[0]
    block_k = k_all.shape[0]
    ki = pl.program_id(2)
    num_qb = sq_pad // block_q

    if fuse_dq:
        @pl.when(ki == 0)
        def _zero_dq():
            dq_ref[...] = jnp.zeros_like(dq_ref)

    def body(qb, carry):
        dks, dvs = carry
        q_all = q_ref[0, pl.ds(qb * block_q, block_q), :]
        do_all = do_ref[0, pl.ds(qb * block_q, block_q), :]
        new_dk, new_dv = [], []
        for g in range(group):
            qg = q_all[:, g * d:(g + 1) * d]
            kg = k_all[:, g * d:(g + 1) * d]
            vg = v_all[:, g * d:(g + 1) * d]
            dog = do_all[:, g * d:(g + 1) * d]
            lse_g = lse_ref[0, 0, 8 * g, pl.ds(qb * block_q, block_q)]
            delta_g = delta_ref[0, 0, 8 * g, pl.ds(qb * block_q, block_q)]
            s = jax.lax.dot_general(
                qg, kg, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale
            # masks only when padding exists — on block-aligned shapes the
            # iota+where passes are pure VPU overhead in the hot loop
            if sk_actual < sk_pad or causal:
                k_pos = ki * block_k + jax.lax.broadcasted_iota(
                    jnp.int32, s.shape, 1
                )
                if sk_actual < sk_pad:
                    s = jnp.where(k_pos < sk_actual, s, NEG_INF)
            if causal or sq_actual < sq_pad:
                q_pos = qb * block_q + jax.lax.broadcasted_iota(
                    jnp.int32, s.shape, 0
                )
            if causal:
                s = jnp.where(k_pos <= q_pos, s, NEG_INF)
            p = jnp.exp(s - lse_g[:, None])
            if sq_actual < sq_pad:
                p = jnp.where(q_pos < sq_actual, p, 0.0)  # padded q rows
            new_dv.append(dvs[g] + jax.lax.dot_general(
                p.astype(dog.dtype), dog,
                (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            ))
            dp = jax.lax.dot_general(
                dog, vg, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            ds = (p * (dp - delta_g[:, None]) * scale).astype(qg.dtype)
            new_dk.append(dks[g] + jax.lax.dot_general(
                ds, qg, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            ))
            if fuse_dq:
                dqg = jax.lax.dot_general(
                    ds, kg, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                qs = pl.ds(qb * block_q, block_q)
                dq_ref[0, qs, g * d:(g + 1) * d] = (
                    dq_ref[0, qs, g * d:(g + 1) * d] + dqg
                )
        return tuple(new_dk), tuple(new_dv)

    unroll = _bwd_unroll(num_qb, block_q, block_k, group * d)
    # the grid-persistent f32 dq block shares scoped VMEM with the loop
    # temporaries — give up the unroll rather than overflow when large
    if fuse_dq and sq_pad * group * d * 4 > 4 * 1024 * 1024:
        unroll = 1
    # wide head groups keep full-sequence q/dO windows resident whose size
    # scales with G*d; doubling the loop temporaries on top measured past
    # the scoped-VMEM stack at d=256 — keep the window, drop the unroll
    if group * d >= 256:
        unroll = 1

    def unrolled(i, carry):
        if unroll == 2:
            return body(2 * i + 1, body(2 * i, carry))
        return body(i, carry)

    init = (
        tuple(jnp.zeros((block_k, d), jnp.float32) for _ in range(group)),
        tuple(jnp.zeros((block_k, d), jnp.float32) for _ in range(group)),
    )
    dks, dvs = jax.lax.fori_loop(0, num_qb // unroll, unrolled, init)
    dk_ref[0] = jnp.concatenate(dks, axis=1).astype(dk_ref.dtype)
    dv_ref[0] = jnp.concatenate(dvs, axis=1).astype(dv_ref.dtype)


def _bwd_dq_kernel_bshd(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                        dq_ref, *, scale, causal, sk_actual, sk_pad,
                        block_k, group, d):
    """Separate dq pass for the heads-packed layout (one q block per grid
    step, loop over k blocks) — used when the fused kernel's persistent
    dq accumulator would overflow scoped VMEM."""
    q = q_ref[0]  # (BQ, G*d)
    do = do_ref[0]
    block_q = q.shape[0]
    qi = pl.program_id(2)
    num_kb = sk_pad // block_k

    def step(kb, dqs):
        k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :]
        new_dqs = []
        for g in range(group):
            qg = q[:, g * d:(g + 1) * d]
            kg = k_blk[:, g * d:(g + 1) * d]
            vg = v_blk[:, g * d:(g + 1) * d]
            dog = do[:, g * d:(g + 1) * d]
            lse_g = lse_ref[0, 0, 8 * g]
            delta_g = delta_ref[0, 0, 8 * g]
            s = jax.lax.dot_general(
                qg, kg, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale
            if sk_actual < sk_pad or causal:
                k_pos = kb * block_k + jax.lax.broadcasted_iota(
                    jnp.int32, s.shape, 1
                )
                if sk_actual < sk_pad:
                    s = jnp.where(k_pos < sk_actual, s, NEG_INF)
            if causal:
                q_pos = qi * block_q + jax.lax.broadcasted_iota(
                    jnp.int32, s.shape, 0
                )
                s = jnp.where(k_pos <= q_pos, s, NEG_INF)
            p = jnp.exp(s - lse_g[:, None])
            dp = jax.lax.dot_general(
                dog, vg, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            ds = (p * (dp - delta_g[:, None]) * scale).astype(qg.dtype)
            new_dqs.append(dqs[g] + jax.lax.dot_general(
                ds, kg, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            ))
        return tuple(new_dqs)

    unroll = _bwd_unroll(num_kb, block_q, block_k, group * d)
    if group * d >= 256:  # same resident-window pressure as the dkv kernel
        unroll = 1

    def unrolled(i, dqs):
        if unroll == 2:
            return step(2 * i + 1, step(2 * i, dqs))
        return step(i, dqs)

    init = tuple(jnp.zeros((block_q, d), jnp.float32) for _ in range(group))
    dqs = jax.lax.fori_loop(0, num_kb // unroll, unrolled, init)
    dq_ref[0] = jnp.concatenate(dqs, axis=1).astype(dq_ref.dtype)


def _flash_bwd_bshd(q, k, v, o, lse, do, scale, causal, sq_actual, sk_actual,
                    block_q, block_k, group, d, interpret):
    b, sq, inner = q.shape  # unpadded seq (phase B)
    sk_pad = k.shape[1]
    block_q, block_k = _bwd_blocks(block_q, block_k, sq, sk_pad)
    # the dkvq kernel slices whole-sequence q/dO windows in-kernel:
    # block_q must divide the window — prefer a dividing block, pad rows
    # internally only when none exists (e.g. AuraFlow's 4360)
    if sq % block_q != 0:
        bq_div = next(
            (c for c in (512, 256, 128) if c <= block_q and sq % c == 0), None
        )
        if bq_div is not None:
            block_q = bq_div
    sq_pad = _round_up(sq, block_q)
    gd = group * d
    # Wide head groups (d=256, AuraFlow) double every (BQ, BK)-shaped loop
    # temporary's lane footprint; the dkv kernel's stack measured 16.34 MB
    # of the 16 MB scoped-VMEM budget at 512x512 blocks. Halve the k block
    # so the s/p/dp/ds temporaries fit alongside the resident q/dO windows.
    if gd >= 256 and block_k > 256 and sk_pad % 256 == 0:
        block_k = 256
    hg = inner // gd
    fuse_dq = sq_pad * gd * 4 <= _FUSE_DQ_MAX

    # per-head delta rows in the lse layout: (B, HG, G*8, SQ)
    delta = jnp.sum(
        (do.astype(jnp.float32) * o.astype(jnp.float32)).reshape(
            b, sq, hg, group, d
        ),
        axis=-1,
    ).transpose(0, 2, 3, 1)  # (B, HG, G, SQ)
    delta = jnp.repeat(delta, 8, axis=2)  # (B, HG, G*8, SQ)
    if sq_pad != sq:
        rows = sq_pad - sq
        q = jnp.pad(q, ((0, 0), (0, rows), (0, 0)))
        do = jnp.pad(do, ((0, 0), (0, rows), (0, 0)))
        lse = jnp.pad(lse, ((0, 0), (0, 0), (0, 0), (0, rows)))
        delta = jnp.pad(delta, ((0, 0), (0, 0), (0, 0), (0, rows)))

    dkv_specs = [
        pl.BlockSpec((1, sq_pad, gd), lambda b, g, ki: (b, 0, g)),
        pl.BlockSpec((1, block_k, gd), lambda b, g, ki: (b, ki, g)),
        pl.BlockSpec((1, block_k, gd), lambda b, g, ki: (b, ki, g)),
        pl.BlockSpec((1, sq_pad, gd), lambda b, g, ki: (b, 0, g)),
        pl.BlockSpec((1, 1, group * 8, sq_pad), lambda b, g, ki: (b, g, 0, 0)),
        pl.BlockSpec((1, 1, group * 8, sq_pad), lambda b, g, ki: (b, g, 0, 0)),
    ]
    dkv_out_specs = [
        pl.BlockSpec((1, block_k, gd), lambda b, g, ki: (b, ki, g)),
        pl.BlockSpec((1, block_k, gd), lambda b, g, ki: (b, ki, g)),
    ]
    dkv_out_shape = [
        jax.ShapeDtypeStruct((b, sk_pad, inner), k.dtype),
        jax.ShapeDtypeStruct((b, sk_pad, inner), v.dtype),
    ]
    if fuse_dq:
        # constant in ki: the f32 dq accumulator persists in VMEM
        # across the sequential k-block steps (see kernel docstring)
        dkv_out_specs.append(
            pl.BlockSpec((1, sq_pad, gd), lambda b, g, ki: (b, 0, g))
        )
        dkv_out_shape.append(
            jax.ShapeDtypeStruct((b, sq_pad, inner), jnp.float32)
        )
    out = pl.pallas_call(
        functools.partial(
            _bwd_dkvq_kernel_bshd, scale=scale, causal=causal,
            sq_actual=sq_actual, sq_pad=sq_pad, sk_actual=sk_actual,
            sk_pad=sk_pad, block_q=block_q, group=group, d=d, fuse_dq=fuse_dq,
        ),
        grid=(b, hg, sk_pad // block_k),
        in_specs=dkv_specs,
        out_specs=dkv_out_specs,
        out_shape=dkv_out_shape,
        interpret=interpret,
    )(q, k, v, do, lse, delta)
    if fuse_dq:
        dk, dv, dq = out
        if sq_pad != sq:
            dq = dq[:, :sq]
        return dq.astype(q.dtype), dk, dv

    dk, dv = out
    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel_bshd, scale=scale, causal=causal,
            sk_actual=sk_actual, sk_pad=sk_pad, block_k=block_k,
            group=group, d=d,
        ),
        grid=(b, hg, sq_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, gd), lambda b, g, qi: (b, qi, g)),
            pl.BlockSpec((1, sk_pad, gd), lambda b, g, qi: (b, 0, g)),
            pl.BlockSpec((1, sk_pad, gd), lambda b, g, qi: (b, 0, g)),
            pl.BlockSpec((1, block_q, gd), lambda b, g, qi: (b, qi, g)),
            pl.BlockSpec((1, 1, group * 8, block_q), lambda b, g, qi: (b, g, 0, qi)),
            pl.BlockSpec((1, 1, group * 8, block_q), lambda b, g, qi: (b, g, 0, qi)),
        ],
        out_specs=pl.BlockSpec((1, block_q, gd), lambda b, g, qi: (b, qi, g)),
        out_shape=jax.ShapeDtypeStruct((b, sq_pad, inner), q.dtype),
        interpret=interpret,
    )(q, k, v, do, lse, delta)
    if sq_pad != sq:
        dq = dq[:, :sq]
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9, 10, 11))
def _flash_bshd_core(q, k, v, scale, causal, sq_actual, sk_actual,
                     block_q, block_k, group, d, interpret):
    o, _ = _flash_fwd_bshd(
        q, k, v, scale, causal, sk_actual, block_q, block_k, group, d, interpret
    )
    return o


def _bshd_core_fwd(q, k, v, scale, causal, sq_actual, sk_actual,
                   block_q, block_k, group, d, interpret):
    from jax.ad_checkpoint import checkpoint_name

    o, lse = _flash_fwd_bshd(
        q, k, v, scale, causal, sk_actual, block_q, block_k, group, d, interpret
    )
    o = checkpoint_name(o, "flash_out")
    lse = checkpoint_name(lse, "flash_lse")
    q = checkpoint_name(q, "flash_qkv")
    k = checkpoint_name(k, "flash_qkv")
    v = checkpoint_name(v, "flash_qkv")
    return o, (q, k, v, o, lse)


def _bshd_core_bwd(scale, causal, sq_actual, sk_actual, block_q, block_k,
                   group, d, interpret, residuals, do):
    q, k, v, o, lse = residuals
    dq, dk, dv = _flash_bwd_bshd(
        q, k, v, o, lse, do, scale, causal, sq_actual, sk_actual,
        block_q, block_k, group, d, interpret,
    )
    return dq, dk, dv


_flash_bshd_core.defvjp(_bshd_core_fwd, _bshd_core_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _flash_lse_core(q, k, v, scale, sq_actual, sk_actual, block_q, block_k, interpret):
    o, lse8 = _flash_fwd(q, k, v, None, scale, False, sk_actual, block_q, block_k, interpret)
    b, h, sq_pad, _ = q.shape
    return o, lse8[:, 0, :].reshape(b, h, sq_pad)


def _lse_core_fwd(q, k, v, scale, sq_actual, sk_actual, block_q, block_k, interpret):
    from jax.ad_checkpoint import checkpoint_name

    o, lse8 = _flash_fwd(q, k, v, None, scale, False, sk_actual, block_q, block_k, interpret)
    o = checkpoint_name(o, "flash_out")
    lse8 = checkpoint_name(lse8, "flash_lse")
    b, h, sq_pad, _ = q.shape
    return (o, lse8[:, 0, :].reshape(b, h, sq_pad)), (q, k, v, o, lse8)


def _lse_core_bwd(scale, sq_actual, sk_actual, block_q, block_k, interpret, res, g):
    q, k, v, o, lse8 = res
    do, g_lse = g
    b, h, sq_pad, _ = q.shape
    dq, dk, dv = _flash_bwd(
        q, k, v, None, o, lse8, do, scale, False, sq_actual, sk_actual,
        block_q, block_k, interpret,
        g_lse=g_lse.reshape(b, h, sq_pad),
    )
    return dq, dk, dv


_flash_lse_core.defvjp(_lse_core_fwd, _lse_core_bwd)


def flash_attention_with_lse(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Flash attention returning ``(out, lse)`` — the pair a ring /
    context-parallel merge needs (``vision_ft_tpu.ops.ring_attention``).

    Handles all sequence/head-dim padding internally (shard lengths need
    not be block multiples) and carries its own custom VJP, including the
    lse cotangent that flows back through the ring's log-sum-exp merge.
    No mask / causal support — the ring path is full bidirectional
    attention.
    """
    b, h, sq, d = q.shape
    sk = k.shape[2]
    if scale is None:
        scale = d**-0.5
    d_pad = d if d % 8 == 0 else _round_up(d, 128)
    block_q = _round_up(sq, 128) if sq <= 1024 else min(BLOCK_Q, _round_up(sq, 128))
    block_k = min(BLOCK_K, _round_up(sk, 128))
    sq_pad = _round_up(sq, block_q)
    sk_pad = _round_up(sk, block_k)

    def pad(x, s_pad):
        return jnp.pad(x, ((0, 0), (0, 0), (0, s_pad - x.shape[2]), (0, d_pad - d)))

    o, lse = _flash_lse_core(
        pad(q, sq_pad), pad(k, sk_pad), pad(v, sk_pad),
        scale, sq, sk, block_q, block_k, interpret,
    )
    return o[:, :, :sq, :d], lse[:, :, :sq]


# ---------------------------------------------------------------------------
# short-K cross-attention kernel — the SDXL text cross-attn path
#
# SDXL's cross attention runs at Sk=77 (the CLIP context), which the main
# kernel refuses (<256 keys: its grid overhead loses to XLA). But the XLA
# path materializes the (B, H, Sq, Sk) logits in fp32 HBM and re-reads
# them through softmax fwd+bwd — ~65 ms/step of the r4 SDXL train profile
# (ops/attention.py:48-155 lines). Here the WHOLE key context lives in
# VMEM: one program per q block computes logits, softmax and PV without
# the logits ever touching HBM; the backward fuses dq/dk/dv in a single
# kernel with grid-persistent dk/dv accumulators (the same
# revisited-output trick as the fused dq). No mask / causal support —
# those cases stay on the XLA path.


def _fwd_kernel_shortk(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale,
                       sk_actual, sk_pad, d):
    q = q_ref[0]                       # (BQ, d)
    k = k_ref[0]                       # (SKP, d)
    v = v_ref[0]
    vones = d % 128 != 0
    if vones:
        v = jnp.concatenate([v, jnp.ones((v.shape[0], 1), v.dtype)], axis=1)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                          # (BQ, SKP) f32 — VMEM only
    if sk_actual < sk_pad:
        k_pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(k_pos < sk_actual, s, NEG_INF)
    m = jnp.max(s, axis=1)
    p = jnp.exp(s - m[:, None])
    acc = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    l = acc[:, d] if vones else jnp.sum(p, axis=1)
    l_safe = jnp.maximum(l, 1e-30)
    o_ref[0] = ((acc[:, :d] if vones else acc) / l_safe[:, None]).astype(
        o_ref.dtype
    )
    lse_ref[0] = jnp.broadcast_to(
        (m + jnp.log(l_safe))[None, :], (8, q.shape[0])
    )


def _bwd_kernel_shortk(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                       dq_ref, dk_ref, dv_ref, *, scale, sk_actual, sk_pad, d):
    qi = pl.program_id(1)

    @pl.when(qi == 0)
    def _zero():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    q = q_ref[0]                       # (BQ, d)
    k = k_ref[0]                       # (SKP, d)
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0, 0]
    delta = delta_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if sk_actual < sk_pad:
        k_pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(k_pos < sk_actual, s, NEG_INF)
    p = jnp.exp(s - lse[:, None])
    dv_ref[0] = dv_ref[0] + jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = (p * (dp - delta[:, None]) * scale).astype(q.dtype)
    dk_ref[0] = dk_ref[0] + jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dq_ref[0] = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dq_ref.dtype)


SHORTK_MAX = 192  # pad-to-128/256 keeps the whole context one lane tile-ish


def _shortk_blocks(sq: int) -> int:
    """Largest halving-of-2048 q block dividing ``sq``, clamped to >=128:
    sub-128 blocks (sq with a small power-of-two factor, e.g. 4360 -> 8)
    make sub-8-sublane tiles Mosaic may reject and pathological grids.
    When nothing >=128 divides (or the divisor isn't sublane-aligned),
    returns a fixed block and the entry point PADS sq up to a multiple."""
    block_q = min(2048, sq)
    while sq % block_q and block_q > 128:
        block_q //= 2
    if sq % block_q or block_q % 8:
        block_q = 512 if sq >= 512 else 128
    return block_q


def _shortk_fwd_call(q, k, v, scale, sk_actual, interpret):
    b, h, sq, d = q.shape
    sk_pad = k.shape[2]
    block_q = _shortk_blocks(sq)
    assert sq % block_q == 0, (sq, block_q)  # entry point padded sq
    o, lse = pl.pallas_call(
        functools.partial(
            _fwd_kernel_shortk, scale=scale, sk_actual=sk_actual,
            sk_pad=sk_pad, d=d,
        ),
        grid=(b * h, sq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0)),
            pl.BlockSpec((1, sk_pad, d), lambda bh, qi: (bh, 0, 0)),
            pl.BlockSpec((1, sk_pad, d), lambda bh, qi: (bh, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0)),
            pl.BlockSpec((1, 8, block_q), lambda bh, qi: (bh, 0, qi)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, sq, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, 8, sq), jnp.float32),
        ],
        interpret=interpret,
    )(q.reshape(b * h, sq, d), k.reshape(b * h, sk_pad, d),
      v.reshape(b * h, sk_pad, d))
    return o.reshape(b, h, sq, d), lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _shortk_core(q, k, v, scale, sk_actual, interpret):
    o, _ = _shortk_fwd_call(q, k, v, scale, sk_actual, interpret)
    return o


def _shortk_core_fwd(q, k, v, scale, sk_actual, interpret):
    from jax.ad_checkpoint import checkpoint_name

    o, lse = _shortk_fwd_call(q, k, v, scale, sk_actual, interpret)
    o = checkpoint_name(o, "flash_out")
    lse = checkpoint_name(lse, "flash_lse")
    q = checkpoint_name(q, "flash_qkv")
    k = checkpoint_name(k, "flash_qkv")
    v = checkpoint_name(v, "flash_qkv")
    return o, (q, k, v, o, lse)


def _shortk_core_bwd(scale, sk_actual, interpret, res, g):
    q, k, v, o, lse = res
    b, h, sq, d = q.shape
    sk_pad = k.shape[2]
    block_q = _shortk_blocks(sq)
    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    delta_ = jnp.broadcast_to(
        delta.reshape(b * h, 1, sq), (b * h, 8, sq)
    )
    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_kernel_shortk, scale=scale, sk_actual=sk_actual,
            sk_pad=sk_pad, d=d,
        ),
        grid=(b * h, sq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0)),
            pl.BlockSpec((1, sk_pad, d), lambda bh, qi: (bh, 0, 0)),
            pl.BlockSpec((1, sk_pad, d), lambda bh, qi: (bh, 0, 0)),
            pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0)),
            pl.BlockSpec((1, 8, block_q), lambda bh, qi: (bh, 0, qi)),
            pl.BlockSpec((1, 8, block_q), lambda bh, qi: (bh, 0, qi)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0)),
            # constant in qi: grid-persistent f32 dk/dv accumulators
            pl.BlockSpec((1, sk_pad, d), lambda bh, qi: (bh, 0, 0)),
            pl.BlockSpec((1, sk_pad, d), lambda bh, qi: (bh, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, sq, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, sk_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((b * h, sk_pad, d), jnp.float32),
        ],
        interpret=interpret,
    )(q.reshape(b * h, sq, d), k.reshape(b * h, sk_pad, d),
      v.reshape(b * h, sk_pad, d), g.reshape(b * h, sq, d), lse, delta_)
    return (
        dq.reshape(b, h, sq, d),
        dk.reshape(b, h, sk_pad, d).astype(k.dtype),
        dv.reshape(b, h, sk_pad, d).astype(v.dtype),
    )


_shortk_core.defvjp(_shortk_core_fwd, _shortk_core_bwd)


def flash_attention_shortk(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
    interpret: bool = False,
) -> jax.Array:
    """VMEM-resident attention for short key contexts (sk <= SHORTK_MAX):
    SDXL's 77-token cross attention. No mask / causal support — callers
    dispatch those to the XLA path.

    sq with no reasonable dividing block is zero-padded to a multiple of
    the kernel block (padded q rows attend over real keys; their outputs
    are sliced off, and in the backward their zero dO rows contribute
    exact zeros to dk/dv)."""
    b, h, sq, d = q.shape
    sk = k.shape[2]
    if sk > SHORTK_MAX:
        raise ValueError(
            f"flash_attention_shortk: sk={sk} exceeds SHORTK_MAX="
            f"{SHORTK_MAX}; use flash_attention_tpu"
        )
    if scale is None:
        scale = d**-0.5
    sk_pad = _round_up(sk, 128)
    dp = d if d % 8 == 0 else _round_up(d, 128)
    block_q = _shortk_blocks(sq)
    sq_pad = _round_up(sq, block_q)

    def pad_kv(x):
        return jnp.pad(
            x, ((0, 0), (0, 0), (0, sk_pad - sk), (0, dp - d))
        )

    qp = (
        jnp.pad(q, ((0, 0), (0, 0), (0, sq_pad - sq), (0, dp - d)))
        if (dp != d or sq_pad != sq)
        else q
    )
    o = _shortk_core(qp, pad_kv(k), pad_kv(v), scale, sk, interpret)
    return o[:, :, :sq, :d] if (dp != d or sq_pad != sq) else o
