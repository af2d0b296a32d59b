"""Fractal masked-autoregressive generator (reference
src/models/fractal/generator.py, 458 LoC — FractalGen-style masked ViT
whose per-patch outputs condition the next recursion level).

Static-shape delta: the reference gathers only the masked rows for the
loss (generator.py:434-452, dynamic shapes); here forward returns the
DENSE per-position tensors plus the mask so losses weight by the mask —
identical math, fixed shapes for XLA.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ...nn import LayerNorm, Linear, Module, ModuleDict, split_keys
from ...ops.attention import scaled_dot_product_attention
from .pixel import PixelTransformer


class FractalTransformerBlock(ModuleDict):
    """Pre-LN ViT block (reference FractalTransformerBlock, :95-135)."""

    def __init__(self, hidden_dim: int, num_heads: int, qkv_bias: bool = False,
                 mlp_ratio: float = 4.0, backend: str = "xla"):
        self.num_heads = num_heads
        self.head_dim = hidden_dim // num_heads
        self.backend = backend
        inner = int(hidden_dim * mlp_ratio)
        super().__init__(
            {
                "norm1": LayerNorm(hidden_dim),
                "attn": ModuleDict(
                    {
                        "to_q": Linear(hidden_dim, hidden_dim, bias=qkv_bias),
                        "to_k": Linear(hidden_dim, hidden_dim, bias=qkv_bias),
                        "to_v": Linear(hidden_dim, hidden_dim, bias=qkv_bias),
                        "to_o": Linear(hidden_dim, hidden_dim),
                    }
                ),
                "norm2": LayerNorm(hidden_dim),
                "mlp": ModuleDict(
                    {"fc1": Linear(hidden_dim, inner), "fc2": Linear(inner, hidden_dim)}
                ),
            }
        )

    def _attention(self, params, x):
        b, s, d = x.shape
        h, hd = self.num_heads, self.head_dim

        def heads(t):
            return t.reshape(b, s, h, hd).transpose(0, 2, 1, 3)

        a = params["attn"]
        q = heads(self["attn"]["to_q"](a["to_q"], x))
        k = heads(self["attn"]["to_k"](a["to_k"], x))
        v = heads(self["attn"]["to_v"](a["to_v"], x))
        attn = scaled_dot_product_attention(q, k, v, backend=self.backend)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, s, d)
        return self["attn"]["to_o"](a["to_o"], attn)

    def __call__(self, params, x):
        x = x + self._attention(params, self["norm1"](params["norm1"], x))
        h = self["norm2"](params["norm2"], x)
        h = self["mlp"]["fc1"](params["mlp"]["fc1"], h)
        h = jax.nn.gelu(h, approximate=False)
        h = self["mlp"]["fc2"](params["mlp"]["fc2"], h)
        return x + h


class FractalMaskedTransformerOutput(NamedTuple):
    mask_prediction: jax.Array  # (B, S, hidden)
    surrounding_patches: jax.Array  # (5, B, S, hidden) dense (select by mask)
    guiding_pixel_loss: jax.Array


def _shifted(latent: jax.Array) -> jax.Array:
    """[center, top, bottom, left, right] zero-padded shifts over the
    (B, h, w, C) grid (reference _shifted_patches, :251-302)."""
    top = jnp.pad(latent[:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0)))
    bottom = jnp.pad(latent[:, 1:], ((0, 0), (0, 1), (0, 0), (0, 0)))
    left = jnp.pad(latent[:, :, :-1], ((0, 0), (0, 0), (1, 0), (0, 0)))
    right = jnp.pad(latent[:, :, 1:], ((0, 0), (0, 0), (0, 1), (0, 0)))
    return jnp.stack([latent, top, bottom, left, right], axis=0)


class FractalMaskedTransformer(Module):
    """(reference FractalMaskedTransformer, :144-458)."""

    def __init__(
        self,
        patch_size: int,
        condition_embedding_dim: int,
        hidden_dim: int,
        num_blocks: int,
        num_heads: int,
        in_channels: int = 3,
        out_channels: int = 3,
        qkv_bias: bool = False,
        attention_backend: str = "xla",
        mlp_ratio: float = 4.0,
        use_guiding_pixel: bool = False,
    ):
        self.patch_size = patch_size
        self.hidden_dim = hidden_dim
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.use_guiding_pixel = use_guiding_pixel
        self.patch_embedder = Linear(in_channels * patch_size**2, hidden_dim)
        self.patch_embed_layer_norm = LayerNorm(hidden_dim, eps=1e-6)
        self.cond_embedder = Linear(condition_embedding_dim, hidden_dim)
        if use_guiding_pixel:
            self.guiding_pixel_embedder = Linear(in_channels, hidden_dim)
            self.pixel_predictor = PixelTransformer(
                channels=in_channels, hidden_dim=hidden_dim,
                num_blocks=num_blocks, num_heads=num_heads,
                attention_backend=attention_backend,
            )
        self.blocks = [
            FractalTransformerBlock(
                hidden_dim, num_heads, qkv_bias, mlp_ratio, attention_backend
            )
            for _ in range(num_blocks)
        ]
        self.norm = LayerNorm(hidden_dim, eps=1e-6)

    def init(self, key, dtype=jnp.float32):
        names = ["mask", "patch", "cond", "pe_ln", "norm", "gp", "pp"] + [
            f"blocks.{i}" for i in range(len(self.blocks))
        ]
        keys = split_keys(key, names)
        params = {
            "mask_token": 0.02 * jax.random.normal(
                keys["mask"], (1, 1, self.hidden_dim), dtype
            ),
            "patch_embedder": self.patch_embedder.init(keys["patch"], dtype),
            "patch_embed_layer_norm": self.patch_embed_layer_norm.init(
                keys["pe_ln"], dtype
            ),
            "cond_embedder": self.cond_embedder.init(keys["cond"], dtype),
            "blocks": {
                str(i): blk.init(keys[f"blocks.{i}"], dtype)
                for i, blk in enumerate(self.blocks)
            },
            "norm": self.norm.init(keys["norm"], dtype),
        }
        if self.use_guiding_pixel:
            params["guiding_pixel_embedder"] = self.guiding_pixel_embedder.init(
                keys["gp"], dtype
            )
            params["pixel_predictor"] = self.pixel_predictor.init(keys["pp"], dtype)
        return params

    # -- patching (c-major feature order, reference modules/patch.py) -------

    def patchify(self, image: jax.Array):
        """NHWC image -> ((B, h*w, C*p*p), h, w)."""
        from ...modules.patch import patchify

        b, height, width, c = image.shape
        p = self.patch_size
        return patchify(image, p), height // p, width // p

    def unpatchify(self, patches: jax.Array, latent_height: int, latent_width: int):
        from ...modules.patch import unpatchify_cmajor

        return unpatchify_cmajor(
            patches, latent_height, latent_width, self.patch_size, self.out_channels
        )

    def get_surrounding_patches(
        self, patches: jax.Array, latent_height: int, latent_width: int
    ) -> jax.Array:
        b, s, c = patches.shape
        latent = patches.reshape(b, latent_height, latent_width, c)
        return _shifted(latent).reshape(5, b, s, c)

    # -- forward ----------------------------------------------------------------

    def predict_mask(
        self,
        params,
        patches: jax.Array,
        mask: jax.Array,  # (B, S) bool, True = masked
        condition: jax.Array,  # (B, S_cond, hidden)
        guiding_pixel: Optional[jax.Array] = None,
    ) -> jax.Array:
        patches = self.patch_embedder(params["patch_embedder"], patches)
        context = jnp.concatenate([condition, patches], axis=1)
        cond_len = condition.shape[1]
        if self.use_guiding_pixel:
            assert guiding_pixel is not None
            gp = self.guiding_pixel_embedder(
                params["guiding_pixel_embedder"], guiding_pixel
            )[:, None]
            context = jnp.concatenate([gp, context], axis=1)
            cond_len += 1

        b = context.shape[0]
        cond_mask = jnp.zeros((b, cond_len), bool)
        context_mask = jnp.concatenate([cond_mask, mask.astype(bool)], axis=1)
        context = jnp.where(
            context_mask[..., None],
            params["mask_token"].astype(context.dtype),
            context,
        )
        context = self.patch_embed_layer_norm(
            params["patch_embed_layer_norm"], context
        )
        for i, blk in enumerate(self.blocks):
            context = blk(params["blocks"][str(i)], context)
        context = self.norm(params["norm"], context)
        return context[:, cond_len:]

    def __call__(
        self,
        params,
        image: jax.Array,  # (B, H, W, C) NHWC
        condition: jax.Array,  # (B, S_cond, cond_dim) already embedded
        mask: jax.Array,  # (B, S) bool
        key: Optional[jax.Array] = None,
    ) -> FractalMaskedTransformerOutput:
        patches, lh, lw = self.patchify(image)

        # NOTE: the reference forward is unfinished in two spots — it
        # concatenates the raw (B, C) guiding pixel onto the (B, S, D)
        # condition (generator.py:415-417, a shape error) and never uses
        # cond_embedder. We keep cond_embedder in the tree for key parity,
        # expect `condition` already at hidden_dim (like predict_mask
        # does), and skip the broken concat.
        if self.use_guiding_pixel:
            assert key is not None, "guiding-pixel dither needs a PRNG key"
            guiding_pixel = jnp.mean(image, axis=(1, 2))  # (B, C)
            logits, labels = self.pixel_predictor(
                params["pixel_predictor"], key, condition, guiding_pixel
            )
            per_channel = logits.reshape(logits.shape[0], 3, 256)
            logp = jax.nn.log_softmax(per_channel.astype(jnp.float32), axis=-1)
            guiding_pixel_loss = -jnp.mean(
                jnp.take_along_axis(logp, labels[..., None], axis=-1)
            )
        else:
            guiding_pixel = None
            guiding_pixel_loss = jnp.float32(0.0)

        mask_prediction = self.predict_mask(
            params, patches, mask, condition, guiding_pixel
        )
        surrounding = self.get_surrounding_patches(mask_prediction, lh, lw)
        return FractalMaskedTransformerOutput(
            mask_prediction=mask_prediction,
            surrounding_patches=surrounding,
            guiding_pixel_loss=guiding_pixel_loss,
        )
