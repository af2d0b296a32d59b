"""Attention dispatch.

The single entry point every denoiser/text-encoder in the framework calls,
mirroring the reference's backend enum
(/root/reference/src/modules/attention.py:23-170) but with TPU-native
backends: "xla" (lax einsum+softmax, fused by XLA) and "flash" (Pallas
blockwise flash-attention kernel). The reference's CUDA backend names are
accepted as aliases so configs port unchanged.

Layout: q, k, v are (batch, num_heads, seq, head_dim) like the reference.
"""

from __future__ import annotations

from functools import partial
from typing import Literal, Optional

import os

import jax
import jax.numpy as jnp
from jax import lax

AttentionImplementation = Literal[
    # TPU-native names
    "xla",
    "flash",
    "flash_attention",
    # reference aliases (src/modules/attention.py:23-28)
    "eager",
    "sdpa",
    "flash_attention_2",
    "xformers",
]

_FLASH_BACKENDS = {"flash", "flash_attention", "flash_attention_2", "xformers"}
_XLA_BACKENDS = {"xla", "eager", "sdpa"}


def _xla_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array],
    scale: float,
    is_causal: bool,
) -> jax.Array:
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk",
        q,
        k,
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    ) * scale
    if is_causal:
        q_len, k_len = logits.shape[-2], logits.shape[-1]
        causal = jnp.tril(jnp.ones((q_len, k_len), dtype=bool), k_len - q_len)
        logits = jnp.where(causal, logits, -jnp.inf)
    if mask is not None:
        if mask.dtype == jnp.bool_:
            logits = jnp.where(mask, logits, -jnp.inf)
        else:
            logits = logits + mask.astype(jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1)
    # fully-masked rows (e.g. IP-Adapter's zero ip_mask when no reference
    # image is given) produce NaN in a plain softmax; define them as 0
    # attention output instead (the flash kernel does the same)
    weights = jnp.where(jnp.isnan(weights), 0.0, weights).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v, precision=lax.Precision.HIGHEST)


def scaled_dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    dropout: float = 0.0,
    backend: AttentionImplementation = "xla",
    is_causal: bool = False,
    tag_qkv: bool = True,
) -> jax.Array:
    """Scaled dot-product attention over (B, H, S, D) tensors.

    ``mask``: boolean (True = attend) or additive float, broadcastable to
    (B, H, Sq, Sk). Dropout is accepted for API parity but ignored (the
    reference only ever uses dropout=0.0 in attention).

    ``tag_qkv=False`` (flash path): skip the kernel-internal ``flash_qkv``
    remat-save tags; GQA callers tag their own pre-repeat k/v instead.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if backend in _FLASH_BACKENDS and k.shape[2] >= 256:
        # flop accounting mirrors the TPU dispatch rule: short key
        # contexts (sk < 256) run on the XLA path on-chip too, so their
        # flops belong to cost_analysis, not the kernel correction
        from .flop_count import add_attention_dispatch

        add_attention_dispatch(
            q.shape[0], q.shape[1], q.shape[2], k.shape[2], q.shape[3]
        )
    if backend in _FLASH_BACKENDS:
        from .flash_attention import flash_attention

        return flash_attention(
            q, k, v, mask=mask, scale=scale, is_causal=is_causal, tag_qkv=tag_qkv
        )
    if backend not in _XLA_BACKENDS:
        # a typo'd backend silently degrading to the eager path is a perf
        # trap (the reference raises for unknown backends too,
        # src/modules/attention.py:158-160)
        raise ValueError(f"unknown attention backend {backend!r}")
    return _xla_attention(q, k, v, mask, scale, is_causal)


def attention_heads_packed(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    backend: AttentionImplementation = "xla",
    is_causal: bool = False,
) -> jax.Array:
    """Attention over heads-packed ``(B, S, H*D)`` tensors — the layout
    the qkv projections already produce.

    On the TPU flash path this dispatches to the BSHD Pallas kernel,
    which addresses the packed array per lane-aligned head group: the
    (B,H,S,D) transposes (two HBM copies per attention, plus the
    transpose XLA fused into the out-projection at ~60 TF/s) disappear
    entirely. Everything else falls back to the classic path via
    on-the-fly transposes.
    """
    b, s, inner = q.shape
    d = inner // num_heads
    if scale is None:
        scale = d**-0.5
    sk = k.shape[1]
    if (
        backend in _FLASH_BACKENDS
        and mask is None
        and sk >= 256
        and jax.default_backend() == "tpu"
        # A/B lever: VFT_PACKED_ATTN=0 forces the classic transpose path
        and os.environ.get("VFT_PACKED_ATTN", "1") != "0"
    ):
        from .pallas.flash_attention import bshd_group, flash_attention_bshd

        if bshd_group(num_heads, d) > 0:
            from .flop_count import add_attention_dispatch

            add_attention_dispatch(b, num_heads, s, sk, d)
            return flash_attention_bshd(
                q, k, v, num_heads, scale=scale, is_causal=is_causal
            )

    def heads(t):
        return t.reshape(b, t.shape[1], num_heads, d).transpose(0, 2, 1, 3)

    out = scaled_dot_product_attention(
        heads(q), heads(k), heads(v), mask=mask, scale=scale,
        backend=backend, is_causal=is_causal,
    )
    return out.transpose(0, 2, 1, 3).reshape(b, s, inner)


def scaled_qkv_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
    use_flash: bool = False,
    attention_dtype=jnp.bfloat16,
) -> jax.Array:
    """Deprecated (B, H, S, D) attention kept for reference API parity
    (src/modules/attention.py:31-95 — still used by its AuraFlow)."""
    import warnings

    warnings.warn("This function is deprecated and will be removed", stacklevel=2)
    orig = q.dtype
    q, k, v = (t.astype(attention_dtype) for t in (q, k, v))
    out = scaled_dot_product_attention(
        q, k, v, scale=scale, backend="flash" if use_flash else "xla"
    )
    return out.astype(orig)


def get_attn_implementation_label(use_flash_attention: bool) -> AttentionImplementation:
    """Backend label for config plumbing (reference attention.py:162-170;
    the flash path is always available here — it is the Pallas kernel)."""
    return "flash_attention_2" if use_flash_attention else "sdpa"
