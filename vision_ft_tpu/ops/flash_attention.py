"""Flash attention dispatch.

Routes to the Pallas TPU kernel (ops/pallas/flash_attention.py) when the
inputs fit its support matrix, otherwise to the XLA einsum-softmax path —
the TPU-native replacement for every flash-attn/xformers call site in the
reference (/root/reference/src/modules/attention.py:131-157).

Support matrix for the kernel: no mask, or a boolean key mask of shape
(B, Sk) / (B, 1, 1, Sk); any head_dim (padded to 128 lanes); causal ok.
Full (B, H, Sq, Sk) float/bool masks and CPU runs fall back to XLA
(numerically equivalent; tests exercise the kernel via interpret mode).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _as_key_mask(mask: Optional[jax.Array], b: int, sk: int) -> Optional[jax.Array]:
    """Reduce a supported mask to (B, Sk) bool; None if unsupported."""
    if mask is None:
        return None
    if mask.dtype != jnp.bool_:
        return None  # additive float masks -> XLA path
    shape = mask.shape
    if shape == (b, sk) or shape == (sk,):
        return jnp.broadcast_to(mask.reshape(-1, sk), (b, sk))
    if len(shape) == 4 and shape[0] in (1, b) and shape[1] == 1 and shape[2] == 1:
        return jnp.broadcast_to(mask.reshape(shape[0], sk), (b, sk))
    return None


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    is_causal: bool = False,
    tag_qkv: bool = True,
) -> jax.Array:
    """Flash attention over (B, H, S, D). Falls back to XLA off-TPU or for
    unsupported masks."""
    if scale is None:
        scale = q.shape[-1] ** -0.5

    if _on_tpu():
        b, _, _, _ = q.shape
        sk = k.shape[2]
        key_mask = _as_key_mask(mask, b, sk)
        # tiny key contexts (e.g. 77-token cross attention) are faster on the
        # XLA path than a padded kernel launch (measured on v5e)
        if sk >= 256 and (mask is None or key_mask is not None):
            from .pallas.flash_attention import flash_attention_tpu

            return flash_attention_tpu(
                q, k, v, mask=key_mask, scale=scale, is_causal=is_causal,
                tag_qkv=tag_qkv,
            )
        from .pallas.flash_attention import SHORTK_MAX

        if (
            sk <= SHORTK_MAX
            and mask is None
            and not is_causal
            and os.environ.get("VFT_FLASH_SHORTK", "0") == "1"
        ):
            # VMEM-resident short-K kernel (SDXL 77-token cross attn):
            # keeps the (B,H,Sq,Sk) f32 logits out of HBM entirely.
            # Opt-in until the on-chip A/B vs the XLA path lands.
            from .pallas.flash_attention import flash_attention_shortk

            return flash_attention_shortk(q, k, v, scale=scale)

    from .attention import _xla_attention

    return _xla_attention(q, k, v, mask, scale, is_causal)
