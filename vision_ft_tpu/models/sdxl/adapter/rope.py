"""SDXL RoPE retrofit adapter — 2-axis rotary embeddings bolted onto the
pretrained UNet's attention (reference src/models/sdxl/adapter/rope.py,
580 LoC).

Adds NO parameters: the state dict of a RoPE-retrofit model is byte-wise
identical to vanilla SDXL, so sgm checkpoints load unchanged. The
retrofit swaps in a transformer block that rotates q/k in self-attention
(and q + context-k in cross-attention, with diagonal (i, i) context
positions — reference rope.py:114-122) before the shared attention
dispatch.

TPU-native design: frequency tables are built host-side per
(height, width) / length in float64 (the reference builds complex64
tensors per call and caches them on CPU, rope.py:137-186) and folded into
the jaxpr as constants — static shapes mean each bucket resolution traces
once. Rotation runs in fp32 islands like the reference's
autocast-disabled apply_rope (rope.py:40-53).

Enable/disable follows the PEFT-toggle pattern: context managers set a
trace-time global; re-jit after toggling (documented on
nn.core.set_peft_enabled).
"""

from __future__ import annotations

import math
from contextlib import contextmanager
from typing import Literal, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DenoiserConfig, SDXLConfig
from ..denoiser import (
    CrossAttention,
    Denoiser,
    SelfAttention,
    TransformerBlock,
)
from ..pipeline import SDXLModel

ORIGIN_POSITION = Literal["top_left", "center"]

_ROPE_ENABLED: list[Optional[bool]] = [None]  # None -> use config flag

from ....nn.core import register_trace_flag

register_trace_flag("sdxl_rope", lambda: _ROPE_ENABLED[0])


def set_rope_enabled(enabled: Optional[bool]) -> None:
    """Trace-time global override (None restores the config default).
    Jitted callables capture the flag at trace time — re-jit after
    toggling (same contract as nn.core.set_peft_enabled)."""
    _ROPE_ENABLED[0] = enabled


@contextmanager
def while_rope_enabled():
    prev = _ROPE_ENABLED[0]
    _ROPE_ENABLED[0] = True
    try:
        yield
    finally:
        _ROPE_ENABLED[0] = prev


@contextmanager
def while_rope_disabled():
    prev = _ROPE_ENABLED[0]
    _ROPE_ENABLED[0] = False
    try:
        yield
    finally:
        _ROPE_ENABLED[0] = prev


def _axis_freqs(position_ids: np.ndarray, dim: int, theta: float) -> np.ndarray:
    """Angles (float64) for one axis (reference _get_rope_freqs,
    rope.py:21-37): radians[s, j] = pos[s] / theta^(2j/dim)."""
    exponent = np.arange(0, dim, 2, dtype=np.float64) / dim
    inv = 1.0 / np.power(theta, exponent)
    return position_ids.astype(np.float64)[:, None] * inv[None, :]


class RoPEEmbedder:
    """Host-side cos/sin table factory with per-shape caching
    (reference RoPEEmbedder, rope.py:59-186)."""

    def __init__(
        self,
        rope_dims: tuple[int, ...] = (32, 32),
        rope_theta: float = 10000.0,
        origin_position: ORIGIN_POSITION = "top_left",
    ):
        self.rope_dims = tuple(rope_dims)
        self.rope_theta = rope_theta
        self.origin_position = origin_position
        # cache host numpy (NOT jnp: arrays created during a jit trace are
        # tracers and would leak out of the transformation scope)
        self._image_cache: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}
        self._context_cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def image_freqs(self, height: int, width: int) -> tuple[jax.Array, jax.Array]:
        """(H*W, sum(dims)//2) cos/sin for the y/x token grid
        (reference get_image_position_ids, rope.py:76-112)."""
        key = (height, width)
        if key not in self._image_cache:
            y = np.repeat(np.arange(height, dtype=np.int64), width)
            x = np.tile(np.arange(width, dtype=np.int64), height)
            if self.origin_position == "center":
                # reference quirk preserved: math.ceil(h // 2) == h // 2
                y = y - math.ceil(height // 2)
                x = x - math.ceil(width // 2)
            angles = np.concatenate(
                [
                    _axis_freqs(y, self.rope_dims[0], self.rope_theta),
                    _axis_freqs(x, self.rope_dims[1], self.rope_theta),
                ],
                axis=1,
            )
            self._image_cache[key] = (
                np.cos(angles).astype(np.float32),
                np.sin(angles).astype(np.float32),
            )
        cos, sin = self._image_cache[key]
        return jnp.asarray(cos), jnp.asarray(sin)

    def context_freqs(self, length: int) -> tuple[jax.Array, jax.Array]:
        """Diagonal (i, i) positions for text tokens (reference
        get_context_position_ids, rope.py:114-122)."""
        if length not in self._context_cache:
            ids = np.arange(length, dtype=np.int64)
            angles = np.concatenate(
                [
                    _axis_freqs(ids, self.rope_dims[0], self.rope_theta),
                    _axis_freqs(ids, self.rope_dims[1], self.rope_theta),
                ],
                axis=1,
            )
            self._context_cache[length] = (
                np.cos(angles).astype(np.float32),
                np.sin(angles).astype(np.float32),
            )
        cos, sin = self._context_cache[length]
        return jnp.asarray(cos), jnp.asarray(sin)


def apply_rope(x: jax.Array, freqs: tuple[jax.Array, jax.Array]) -> jax.Array:
    """Interleaved-pair rotation in fp32 (reference apply_rope,
    rope.py:40-53 — complex multiply on (even, odd) pairs).
    x: (B, H, S, D); freqs: cos/sin (S, D//2)."""
    cos, sin = freqs
    dtype = x.dtype
    b, h, s, d = x.shape
    xf = x.astype(jnp.float32).reshape(b, h, s, d // 2, 2)
    even, odd = xf[..., 0], xf[..., 1]
    out_even = even * cos - odd * sin
    out_odd = even * sin + odd * cos
    return jnp.stack([out_even, out_odd], axis=-1).reshape(b, h, s, d).astype(dtype)


class SelfAttentionWithRoPE(SelfAttention):
    """(reference SelfAttentionWithRoPE, rope.py:196-258)."""

    def __call__(self, params, x, image_freqs=None, **_):
        b, s, _ = x.shape
        h, d = self.num_heads, self.head_dim

        def heads(t):
            return t.reshape(b, s, h, d).transpose(0, 2, 1, 3)

        q = heads(self["to_q"](params["to_q"], x))
        k = heads(self["to_k"](params["to_k"], x))
        v = heads(self["to_v"](params["to_v"], x))
        if image_freqs is not None:
            q = apply_rope(q, image_freqs)
            k = apply_rope(k, image_freqs)
        from ....ops.attention import scaled_dot_product_attention

        attn = scaled_dot_product_attention(q, k, v, backend=self.backend)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, s, h * d)
        return self["to_out"]["0"](params["to_out"]["0"], attn)


class CrossAttentionWithRoPE(CrossAttention):
    """(reference CrossAttentionWithRoPE, rope.py:261-316)."""

    def __call__(
        self, params, x, context, image_freqs=None, context_freqs=None, **_
    ):
        b, s, _ = x.shape
        sc = context.shape[1]
        h, d = self.num_heads, self.head_dim

        def heads(t, length):
            return t.reshape(b, length, h, d).transpose(0, 2, 1, 3)

        q = heads(self["to_q"](params["to_q"], x), s)
        k = heads(self["to_k"](params["to_k"], context), sc)
        v = heads(self["to_v"](params["to_v"], context), sc)
        if image_freqs is not None:
            q = apply_rope(q, image_freqs)
            k = apply_rope(k, context_freqs)
        from ....ops.attention import scaled_dot_product_attention

        attn = scaled_dot_product_attention(q, k, v, backend=self.backend)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, s, h * d)
        return self["to_out"]["0"](params["to_out"]["0"], attn)


class TransformerBlockWithRoPE(TransformerBlock):
    """Block that looks up per-resolution freq tables and feeds the rotary
    attentions (reference TransformerWithRoPE, rope.py:350-434). The
    embedder is shared across blocks (same tables per resolution)."""

    def __init__(
        self,
        hidden_dim: int,
        num_heads: int,
        head_dim: int,
        context_dim: int,
        backend,
        cross_attention_class: type = None,
        cross_attention_extra: dict = None,
        rope_embedder: RoPEEmbedder = None,
        rope_enabled: bool = True,
    ):
        super().__init__(
            hidden_dim, num_heads, head_dim, context_dim, backend,
            cross_attention_class, cross_attention_extra,
        )
        # swap both attentions for rotary variants; param keys are identical
        self.children["attn1"] = SelfAttentionWithRoPE(num_heads, head_dim, backend)
        if cross_attention_class is None:
            self.children["attn2"] = CrossAttentionWithRoPE(
                hidden_dim, context_dim, num_heads, head_dim, backend
            )
        self.rope_embedder = rope_embedder or RoPEEmbedder()
        self.rope_enabled = rope_enabled

    def _enabled(self) -> bool:
        override = _ROPE_ENABLED[0]
        return self.rope_enabled if override is None else override

    def __call__(self, params, x, context, cross_attention_kwargs=None, hw=None):
        kwargs = dict(cross_attention_kwargs or {})
        image_freqs = context_freqs = None
        if self._enabled():
            assert hw is not None, "feature-map hw required for RoPE"
            image_freqs = self.rope_embedder.image_freqs(*hw)
            context_freqs = self.rope_embedder.context_freqs(context.shape[1])

        x = x + self["attn1"](
            params["attn1"], self["norm1"](params["norm1"], x),
            image_freqs=image_freqs,
        )
        x = x + self["attn2"](
            params["attn2"], self["norm2"](params["norm2"], x), context,
            image_freqs=image_freqs, context_freqs=context_freqs, **kwargs,
        )
        x = x + self["ff"](params["ff"], self["norm3"](params["norm3"], x))
        return x


class DenoiserConfigWithRoPE(DenoiserConfig):
    """(reference rope.py:437-443)."""

    rope_enabled: bool = True
    migrating: bool = False

    rope_dims: list[int] = [32, 32]
    rope_theta: float = 10000.0
    origin_position: ORIGIN_POSITION = "center"


class DenoiserWithRoPE(Denoiser):
    """(reference DenoiserWithRoPE, rope.py:446-518)."""

    def __init__(self, config: DenoiserConfigWithRoPE):
        embedder = RoPEEmbedder(
            rope_dims=tuple(config.rope_dims),
            rope_theta=config.rope_theta,
            origin_position=config.origin_position,
        )
        self.rope_embedder = embedder
        # thread the shared embedder + flag into every transformer block
        self.transformer_block_class = TransformerBlockWithRoPE
        self.transformer_block_extra = {
            "rope_embedder": embedder,
            "rope_enabled": config.rope_enabled,
        }
        super().__init__(config)
        self.rope_enabled = config.rope_enabled

    def set_rope_enabled(self, enabled: bool) -> None:
        """Mutates the static flag on every block — re-jit afterwards
        (reference set_rope_enabled, rope.py:459-464)."""
        self.rope_enabled = enabled
        for lists in (self.input_lists, [self.middle_list], self.output_lists):
            for layer_list in lists:
                for _, module in layer_list:
                    blocks = getattr(module, "children", {}).get(
                        "transformer_blocks"
                    )
                    if blocks is None:
                        continue
                    for block in blocks.children.values():
                        block.rope_enabled = enabled


class SDXLWithRoPEConfig(SDXLConfig):
    denoiser: DenoiserConfigWithRoPE = DenoiserConfigWithRoPE()


class SDXLWithRoPEModel(SDXLModel):
    """(reference SDXLWithRoPEModel, rope.py:525-554). No extra params:
    checkpoints are plain SDXL sgm state dicts."""

    denoiser_class: type[Denoiser] = DenoiserWithRoPE

    @classmethod
    def from_config(cls, config: SDXLWithRoPEConfig, **kwargs) -> "SDXLWithRoPEModel":
        return cls(config, **kwargs)
