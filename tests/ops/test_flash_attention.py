"""Pallas flash attention vs XLA reference (interpret mode on CPU):
forward parity, mask/causal handling, gradient parity through the custom
VJP, and padding of odd shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_ft_tpu.ops.attention import _xla_attention
from vision_ft_tpu.ops.pallas.flash_attention import flash_attention_tpu


def _rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


@pytest.mark.parametrize(
    "b,h,sq,sk,d",
    [
        (2, 4, 128, 128, 64),   # aligned, head_dim padded 64->128
        (1, 2, 256, 384, 128),  # multi-block, aligned lanes
        (2, 2, 77, 200, 64),    # odd lengths -> padding paths
    ],
)
def test_forward_matches_xla(b, h, sq, sk, d):
    q, k, v = _rand(0, (b, h, sq, d)), _rand(1, (b, h, sk, d)), _rand(2, (b, h, sk, d))
    expected = _xla_attention(q, k, v, None, d**-0.5, False)
    got = flash_attention_tpu(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5, rtol=2e-5)


def test_key_mask_matches_xla():
    b, h, sq, sk, d = 2, 2, 64, 160, 64
    q, k, v = _rand(0, (b, h, sq, d)), _rand(1, (b, h, sk, d)), _rand(2, (b, h, sk, d))
    # variable-length keys + a hole in the middle (Lumina2-style padding)
    key_mask = np.ones((b, sk), bool)
    key_mask[0, 100:] = False
    key_mask[1, 40:60] = False
    key_mask = jnp.asarray(key_mask)
    expected = _xla_attention(q, k, v, key_mask[:, None, None, :], d**-0.5, False)
    got = flash_attention_tpu(q, k, v, mask=key_mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5, rtol=2e-5)


def test_causal_matches_xla():
    b, h, s, d = 1, 2, 256, 64
    q, k, v = _rand(0, (b, h, s, d)), _rand(1, (b, h, s, d)), _rand(2, (b, h, s, d))
    expected = _xla_attention(q, k, v, None, d**-0.5, True)
    got = flash_attention_tpu(q, k, v, is_causal=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5, rtol=2e-5)


def test_gradients_match_xla():
    b, h, sq, sk, d = 1, 2, 128, 256, 64
    q, k, v = _rand(0, (b, h, sq, d)), _rand(1, (b, h, sk, d)), _rand(2, (b, h, sk, d))
    key_mask = jnp.asarray(np.arange(sk) < 200)

    def loss_flash(q, k, v):
        o = flash_attention_tpu(q, k, v, mask=key_mask, interpret=True)
        return jnp.sum(o * jnp.cos(o))

    def loss_xla(q, k, v):
        o = _xla_attention(q, k, v, key_mask[None, None, None, :], d**-0.5, False)
        return jnp.sum(o * jnp.cos(o))

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for gf, gx, name in zip(g_flash, g_xla, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gx), atol=5e-5, rtol=1e-4,
            err_msg=f"d{name} mismatch",
        )


def test_bf16_forward_close():
    b, h, s, d = 1, 2, 128, 64
    q = _rand(0, (b, h, s, d)).astype(jnp.bfloat16)
    k = _rand(1, (b, h, s, d)).astype(jnp.bfloat16)
    v = _rand(2, (b, h, s, d)).astype(jnp.bfloat16)
    expected = _xla_attention(q, k, v, None, d**-0.5, False)
    got = flash_attention_tpu(q, k, v, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(expected, np.float32), atol=3e-2
    )


# ---------------------------------------------------------------------------
# BSHD (heads-packed) kernel


def _ref_bshd(q, k, v, h, scale, causal=False):
    b, s, inner = q.shape
    d = inner // h

    def t(x):
        return x.reshape(b, x.shape[1], h, d).transpose(0, 2, 1, 3)

    o = _xla_attention(t(q), t(k), t(v), None, scale, causal)
    return o.transpose(0, 2, 1, 3).reshape(b, s, inner)


@pytest.mark.parametrize(
    "b,s,sk,h,d,causal",
    [
        (2, 256, 256, 4, 64, False),   # d=64 head pairs (SDXL layout)
        (1, 200, 300, 2, 64, False),   # non-block-multiple padding
        (1, 128, 128, 2, 128, False),  # d=128 single-head groups
        (1, 128, 128, 2, 256, False),  # d=256 (AuraFlow heads)
        (1, 256, 256, 4, 64, True),    # causal
    ],
)
def test_bshd_forward_and_grad_match_xla(b, s, sk, h, d, causal):
    from vision_ft_tpu.ops.pallas.flash_attention import flash_attention_bshd

    inner = h * d
    scale = d**-0.5
    q = _rand(0, (b, s, inner))
    k = _rand(1, (b, sk, inner))
    v = _rand(2, (b, sk, inner))
    out = flash_attention_bshd(q, k, v, h, scale=scale, is_causal=causal, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_ref_bshd(q, k, v, h, scale, causal)),
        atol=2e-5, rtol=2e-5,
    )

    def loss_p(q, k, v):
        o = flash_attention_bshd(q, k, v, h, scale=scale, is_causal=causal, interpret=True)
        return jnp.sum(jnp.sin(o))

    def loss_r(q, k, v):
        return jnp.sum(jnp.sin(_ref_bshd(q, k, v, h, scale, causal)))

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(gp, gr, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=5e-4, rtol=5e-4,
            err_msg=f"d{name} mismatch",
        )


@pytest.mark.parametrize(
    "b,s,sk,h,d,causal",
    [
        (2, 256, 256, 4, 64, False),   # head pairs
        (1, 200, 300, 2, 64, False),   # non-block-multiple padding
        (1, 200, 200, 2, 64, True),    # causal + padding (equal lengths:
                                       # the kernel's causal rule is
                                       # top-left aligned, same as fwd)
        (1, 128, 128, 2, 256, False),  # d=256 (the shape that OOM'd fused
                                       # scoped VMEM on-chip at seq 4608)
    ],
)
def test_bshd_bwd_split_branch_matches_xla(monkeypatch, b, s, sk, h, d, causal):
    """The BSHD backward splits into dkv + separate-dq kernels when the
    fused kernel's persistent f32 dq block would overflow scoped VMEM
    (AuraFlow d=256 @ 4608 tokens: 20.6 MB > 16 MB, caught on-chip).
    Force the split branch and pin grad equality."""
    from vision_ft_tpu.ops.pallas import flash_attention as fa

    monkeypatch.setattr(fa, "_FUSE_DQ_MAX", 0)
    inner = h * d
    scale = d**-0.5
    q = _rand(0, (b, s, inner))
    k = _rand(1, (b, sk, inner))
    v = _rand(2, (b, sk, inner))

    def loss_p(q, k, v):
        o = fa.flash_attention_bshd(
            q, k, v, h, scale=scale, is_causal=causal, interpret=True
        )
        return jnp.sum(jnp.sin(o))

    def loss_r(q, k, v):
        return jnp.sum(jnp.sin(_ref_bshd(q, k, v, h, scale, causal)))

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(gp, gr, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=5e-4, rtol=5e-4,
            err_msg=f"d{name} mismatch (split bwd)",
        )


def test_bshd_group_support_matrix():
    from vision_ft_tpu.ops.pallas.flash_attention import bshd_group

    assert bshd_group(10, 64) == 2   # SDXL 640ch
    assert bshd_group(20, 64) == 2   # SDXL 1280ch
    assert bshd_group(24, 128) == 1  # Flux/Lumina2-style d=128
    assert bshd_group(5, 64) == 0    # odd head count -> BHSD fallback
    assert bshd_group(8, 72) == 0    # unaligned head_dim -> fallback


def test_attention_heads_packed_cpu_fallback_matches():
    """Off-TPU the packed entry must be numerically the classic path."""
    from vision_ft_tpu.ops.attention import attention_heads_packed

    b, s, h, d = 2, 64, 4, 32
    q, k, v = _rand(0, (b, s, h * d)), _rand(1, (b, s, h * d)), _rand(2, (b, s, h * d))
    got = attention_heads_packed(q, k, v, h, backend="flash")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(_ref_bshd(q, k, v, h, d**-0.5)), atol=2e-5, rtol=2e-5
    )


@pytest.mark.parametrize("causal,masked", [(False, False), (True, False), (False, True)])
def test_bwd_two_pass_branch_matches_fused(monkeypatch, causal, masked):
    """The BHSD backward has two code paths gated on _FUSE_DQ_MAX (fused
    dkv+dq kernel vs separate dq pass). Small test shapes always take the
    fused branch; force the two-pass branch and pin grad equality across
    plain / causal / key-masked variants."""
    from vision_ft_tpu.ops.pallas import flash_attention as fa

    b, h, sq, sk, d = 1, 2, 256, 384, 64
    q, k, v = _rand(0, (b, h, sq, d)), _rand(1, (b, h, sk, d)), _rand(2, (b, h, sk, d))
    key_mask = jnp.asarray(np.arange(sk) < 300) if masked else None

    def loss(q, k, v):
        o = flash_attention_tpu(
            q, k, v, mask=key_mask, is_causal=causal, interpret=True
        )
        return jnp.sum(jnp.sin(o))

    g_fused = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    assert sq * d * 4 <= fa._FUSE_DQ_MAX  # really took the fused branch
    monkeypatch.setattr(fa, "_FUSE_DQ_MAX", 0)
    g_two_pass = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for gf, gt, name in zip(g_fused, g_two_pass, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gt), atol=2e-5, rtol=1e-5,
            err_msg=f"d{name} branch mismatch",
        )


def test_lumina2_shape_divisor_path_fwd_and_grad():
    """S=1280 (128-aligned, NOT 512-divisible) with d=96 GQA-repeat heads
    and a right-padded key mask — the Lumina2 joint-sequence shape class.
    Phase-B pad elimination routes this through the partial final q block
    (fwd) and the dividing bwd block (256); numerics must match XLA."""
    b, h, s, d = 1, 2, 1280, 96
    q, k, v = _rand(0, (b, h, s, d)), _rand(1, (b, h, s, d)), _rand(2, (b, h, s, d))
    key_mask = jnp.asarray(np.arange(s) < 1219)

    def loss_flash(q, k, v):
        o = flash_attention_tpu(q, k, v, mask=key_mask, interpret=True)
        return jnp.sum(o * jnp.sin(o))

    def loss_xla(q, k, v):
        o = _xla_attention(q, k, v, key_mask[None, None, None, :], d**-0.5, False)
        return jnp.sum(o * jnp.sin(o))

    np.testing.assert_allclose(
        np.asarray(flash_attention_tpu(q, k, v, mask=key_mask, interpret=True)),
        np.asarray(_xla_attention(q, k, v, key_mask[None, None, None, :],
                                  d**-0.5, False)),
        atol=2e-5, rtol=2e-5,
    )
    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for gf, gx, name in zip(g_flash, g_xla, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gx), atol=5e-5, rtol=1e-4,
            err_msg=f"d{name} mismatch",
        )


@pytest.mark.parametrize("sq,sk,d", [(1024, 77, 64), (256, 77, 64), (512, 128, 128)])
def test_shortk_forward_and_grad_match_xla(sq, sk, d):
    """VMEM-resident short-K cross-attention kernel (SDXL's Sk=77 path):
    forward and all three gradients vs the XLA oracle."""
    from vision_ft_tpu.ops.pallas.flash_attention import flash_attention_shortk

    b, h = 2, 3
    q, k, v = _rand(0, (b, h, sq, d)), _rand(1, (b, h, sk, d)), _rand(2, (b, h, sk, d))

    def loss_flash(q, k, v):
        o = flash_attention_shortk(q, k, v, interpret=True)
        return jnp.sum(o * jnp.cos(o))

    def loss_xla(q, k, v):
        o = _xla_attention(q, k, v, None, d**-0.5, False)
        return jnp.sum(o * jnp.cos(o))

    np.testing.assert_allclose(
        np.asarray(flash_attention_shortk(q, k, v, interpret=True)),
        np.asarray(_xla_attention(q, k, v, None, d**-0.5, False)),
        atol=2e-5, rtol=2e-5,
    )
    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for gf, gx, name in zip(g_flash, g_xla, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gx), atol=5e-5, rtol=1e-4,
            err_msg=f"d{name} mismatch",
        )
