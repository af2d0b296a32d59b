"""KL autoencoder (SD/SDXL/Flux VAE) — TPU-native, diffusers key layout.

The reference delegates its VAEs to diffusers ``AutoencoderKL`` subclasses
with hard-coded configs (/root/reference/src/models/sdxl/vae.py:41-45,
lumina2/vae.py:47-51). This is a from-scratch NHWC implementation whose
param tree flattens to the diffusers state-dict keys, so the reference's
sgm->diffusers VAE key converter (models/sdxl/util.py) feeds it directly.

Architecture (diffusers AutoencoderKL):
  encoder:  conv_in -> 4x DownEncoderBlock2D (2 resnets [+downsampler
            w/ asymmetric (0,1) padding]) -> mid (resnet, attention,
            resnet) -> GN/siLU -> conv_out (2*latent ch)
  quant_conv / post_quant_conv: 1x1 convs on the moments / latents
  decoder:  conv_in -> mid -> 4x UpDecoderBlock2D (3 resnets
            [+nearest-2x upsampler]) -> GN/siLU -> conv_out
All GroupNorms are 32 groups, eps 1e-6; resnet act = SiLU; mid attention
is single-head full attention over HW tokens.

Tiled decode mirrors the reference's >=1536px path
(src/models/sdxl/pipeline.py:213-219) with diffusers' blend semantics.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp

from ...nn import Conv2d, GroupNorm, Linear, Module, ModuleDict, split_keys
from ...ops.attention import scaled_dot_product_attention


@dataclass
class AutoencoderKLConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    # pipeline-level attributes (reference vae.py class attrs)
    compression_ratio: int = 8
    scaling_factor: float = 0.13025
    shift_factor: float = 0.0
    # Flux/Lumina2 VAE has no quant convs (use_quant_conv: false in its
    # diffusers config, reference lumina2/vae.py:36-37)
    use_quant_conv: bool = True
    # CogView4's VAE drops the mid-block attention (reference
    # cogview4/vae.py mid_block_add_attention: false)
    mid_block_add_attention: bool = True


# Flux/Lumina2 share a 16-channel VAE (reference lumina2/vae.py:47-51)
FLUX_VAE_CONFIG = AutoencoderKLConfig(
    latent_channels=16, scaling_factor=0.3611, shift_factor=0.1159,
    use_quant_conv=False,
)
SDXL_VAE_CONFIG = AutoencoderKLConfig()


class ResnetBlock(ModuleDict):
    def __init__(self, in_ch: int, out_ch: int, groups: int = 32):
        self.has_shortcut = in_ch != out_ch
        children = {
            "norm1": GroupNorm(groups, in_ch, eps=1e-6),
            "conv1": Conv2d(in_ch, out_ch, 3, padding=1),
            "norm2": GroupNorm(groups, out_ch, eps=1e-6),
            "conv2": Conv2d(out_ch, out_ch, 3, padding=1),
        }
        if self.has_shortcut:
            children["conv_shortcut"] = Conv2d(in_ch, out_ch, 1)
        super().__init__(children)

    def __call__(self, params, x):
        h = self["norm1"](params["norm1"], x)
        h = jax.nn.silu(h)
        h = self["conv1"](params["conv1"], h)
        h = self["norm2"](params["norm2"], h)
        h = jax.nn.silu(h)
        h = self["conv2"](params["conv2"], h)
        if self.has_shortcut:
            x = self["conv_shortcut"](params["conv_shortcut"], x)
        return x + h


class VAEAttention(ModuleDict):
    """Single-head full attention over HW tokens (diffusers Attention)."""

    def __init__(self, channels: int, groups: int = 32):
        self.channels = channels
        super().__init__(
            {
                "group_norm": GroupNorm(groups, channels, eps=1e-6),
                "to_q": Linear(channels, channels),
                "to_k": Linear(channels, channels),
                "to_v": Linear(channels, channels),
                "to_out": ModuleDict({"0": Linear(channels, channels)}),
            }
        )

    def __call__(self, params, x):
        b, h, w, c = x.shape
        residual = x
        t = self["group_norm"](params["group_norm"], x).reshape(b, h * w, c)
        q = self["to_q"](params["to_q"], t)[:, None]  # (b, 1 head, hw, c)
        k = self["to_k"](params["to_k"], t)[:, None]
        v = self["to_v"](params["to_v"], t)[:, None]
        attn = scaled_dot_product_attention(q, k, v)[:, 0]
        out = self["to_out"]["0"](params["to_out"]["0"], attn)
        return out.reshape(b, h, w, c) + residual


class MidBlock(ModuleDict):
    def __init__(self, channels: int, groups: int = 32, add_attention: bool = True):
        self.add_attention = add_attention
        children = {
            "resnets": ModuleDict(
                {
                    "0": ResnetBlock(channels, channels, groups),
                    "1": ResnetBlock(channels, channels, groups),
                }
            ),
        }
        if add_attention:
            children["attentions"] = ModuleDict({"0": VAEAttention(channels, groups)})
        super().__init__(children)

    def __call__(self, params, x):
        x = self["resnets"]["0"](params["resnets"]["0"], x)
        if self.add_attention:
            x = self["attentions"]["0"](params["attentions"]["0"], x)
        x = self["resnets"]["1"](params["resnets"]["1"], x)
        return x


class Downsampler(ModuleDict):
    """Stride-2 conv with diffusers' asymmetric (0,1)x(0,1) padding."""

    def __init__(self, channels: int):
        super().__init__({"conv": Conv2d(channels, channels, 3, stride=2, padding=0)})

    def __call__(self, params, x):
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return self["conv"](params["conv"], x)


class Upsampler(ModuleDict):
    def __init__(self, channels: int):
        super().__init__({"conv": Conv2d(channels, channels, 3, padding=1)})

    def __call__(self, params, x):
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return self["conv"](params["conv"], x)


class Encoder(Module):
    def __init__(self, config: AutoencoderKLConfig):
        self.config = config
        chs = config.block_out_channels
        g = config.norm_num_groups
        self.conv_in = Conv2d(config.in_channels, chs[0], 3, padding=1)
        blocks = {}
        in_ch = chs[0]
        for i, out_ch in enumerate(chs):
            resnets = {}
            for j in range(config.layers_per_block):
                resnets[str(j)] = ResnetBlock(in_ch if j == 0 else out_ch, out_ch, g)
            block = {"resnets": ModuleDict(resnets)}
            if i != len(chs) - 1:
                block["downsamplers"] = ModuleDict({"0": Downsampler(out_ch)})
            blocks[str(i)] = ModuleDict(block)
            in_ch = out_ch
        self.down_blocks = ModuleDict(blocks)
        self.mid_block = MidBlock(chs[-1], g, config.mid_block_add_attention)
        self.conv_norm_out = GroupNorm(g, chs[-1], eps=1e-6)
        self.conv_out = Conv2d(chs[-1], 2 * config.latent_channels, 3, padding=1)

    def init(self, key, dtype=jnp.float32):
        keys = split_keys(key, ["conv_in", "down", "mid", "norm", "conv_out"])
        return {
            "conv_in": self.conv_in.init(keys["conv_in"], dtype),
            "down_blocks": self.down_blocks.init(keys["down"], dtype),
            "mid_block": self.mid_block.init(keys["mid"], dtype),
            "conv_norm_out": self.conv_norm_out.init(keys["norm"], dtype),
            "conv_out": self.conv_out.init(keys["conv_out"], dtype),
        }

    def __call__(self, params, x):
        h = self.conv_in(params["conv_in"], x)
        for i in range(len(self.config.block_out_channels)):
            block = self.down_blocks[str(i)]
            bp = params["down_blocks"][str(i)]
            for j in range(self.config.layers_per_block):
                h = block["resnets"][str(j)](bp["resnets"][str(j)], h)
            if "downsamplers" in block.children:
                h = block["downsamplers"]["0"](bp["downsamplers"]["0"], h)
        h = self.mid_block(params["mid_block"], h)
        h = self.conv_norm_out(params["conv_norm_out"], h)
        h = jax.nn.silu(h)
        return self.conv_out(params["conv_out"], h)


class Decoder(Module):
    def __init__(self, config: AutoencoderKLConfig):
        self.config = config
        chs = config.block_out_channels
        g = config.norm_num_groups
        rev = list(reversed(chs))
        self.conv_in = Conv2d(config.latent_channels, rev[0], 3, padding=1)
        self.mid_block = MidBlock(rev[0], g, config.mid_block_add_attention)
        blocks = {}
        in_ch = rev[0]
        for i, out_ch in enumerate(rev):
            resnets = {}
            for j in range(config.layers_per_block + 1):
                resnets[str(j)] = ResnetBlock(in_ch if j == 0 else out_ch, out_ch, g)
            block = {"resnets": ModuleDict(resnets)}
            if i != len(rev) - 1:
                block["upsamplers"] = ModuleDict({"0": Upsampler(out_ch)})
            blocks[str(i)] = ModuleDict(block)
            in_ch = out_ch
        self.up_blocks = ModuleDict(blocks)
        self.conv_norm_out = GroupNorm(g, rev[-1], eps=1e-6)
        self.conv_out = Conv2d(rev[-1], config.out_channels, 3, padding=1)

    def init(self, key, dtype=jnp.float32):
        keys = split_keys(key, ["conv_in", "mid", "up", "norm", "conv_out"])
        return {
            "conv_in": self.conv_in.init(keys["conv_in"], dtype),
            "mid_block": self.mid_block.init(keys["mid"], dtype),
            "up_blocks": self.up_blocks.init(keys["up"], dtype),
            "conv_norm_out": self.conv_norm_out.init(keys["norm"], dtype),
            "conv_out": self.conv_out.init(keys["conv_out"], dtype),
        }

    def __call__(self, params, z):
        h = self.conv_in(params["conv_in"], z)
        h = self.mid_block(params["mid_block"], h)
        for i in range(len(self.config.block_out_channels)):
            block = self.up_blocks[str(i)]
            bp = params["up_blocks"][str(i)]
            for j in range(self.config.layers_per_block + 1):
                h = block["resnets"][str(j)](bp["resnets"][str(j)], h)
            if "upsamplers" in block.children:
                h = block["upsamplers"]["0"](bp["upsamplers"]["0"], h)
        h = self.conv_norm_out(params["conv_norm_out"], h)
        h = jax.nn.silu(h)
        return self.conv_out(params["conv_out"], h)


class DiagonalGaussian:
    """diffusers DiagonalGaussianDistribution over NHWC moments."""

    def __init__(self, moments: jax.Array):
        mean, logvar = jnp.split(moments, 2, axis=-1)
        self.mean = mean
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.std = jnp.exp(0.5 * self.logvar)

    def sample(self, key: jax.Array) -> jax.Array:
        noise = jax.random.normal(key, self.mean.shape, self.mean.dtype)
        return self.mean + self.std * noise

    def mode(self) -> jax.Array:
        return self.mean


class AutoencoderKL(Module):
    """Full VAE. All tensors NHWC; latents NHWC (B, H/8, W/8, C)."""

    def __init__(self, config: AutoencoderKLConfig = SDXL_VAE_CONFIG):
        self.config = config
        self.compression_ratio = config.compression_ratio
        self.scaling_factor = config.scaling_factor
        self.shift_factor = config.shift_factor
        self.encoder = Encoder(config)
        self.decoder = Decoder(config)
        c = config.latent_channels
        if config.use_quant_conv:
            self.quant_conv = Conv2d(2 * c, 2 * c, 1)
            self.post_quant_conv = Conv2d(c, c, 1)
        else:
            self.quant_conv = None
            self.post_quant_conv = None

    def init(self, key, dtype=jnp.float32):
        keys = split_keys(key, ["encoder", "decoder", "quant", "post_quant"])
        params = {
            "encoder": self.encoder.init(keys["encoder"], dtype),
            "decoder": self.decoder.init(keys["decoder"], dtype),
        }
        if self.quant_conv is not None:
            params["quant_conv"] = self.quant_conv.init(keys["quant"], dtype)
            params["post_quant_conv"] = self.post_quant_conv.init(keys["post_quant"], dtype)
        return params

    def _encode_impl(self, params, x: jax.Array) -> jax.Array:
        moments = self.encoder(params["encoder"], x)
        if self.quant_conv is not None:
            moments = self.quant_conv(params["quant_conv"], moments)
        return moments

    def encode(self, params, x: jax.Array) -> DiagonalGaussian:
        from ...nn.core import cached_jit

        moments = cached_jit(self, "encode", self._encode_impl)(params, x)
        return DiagonalGaussian(moments)

    def _decode_impl(self, params, z: jax.Array) -> jax.Array:
        if self.post_quant_conv is not None:
            z = self.post_quant_conv(params["post_quant_conv"], z)
        return self.decoder(params["decoder"], z)

    def decode(self, params, z: jax.Array) -> jax.Array:
        from ...nn.core import cached_jit

        return cached_jit(self, "decode", self._decode_impl)(params, z)

    def tiled_decode(
        self,
        params,
        z: jax.Array,
        tile_latent_size: int = 64,
        tile_overlap_factor: float = 0.25,
    ) -> jax.Array:
        """Decode in overlapping tiles and blend seams (diffusers
        AutoencoderKL.tiled_decode semantics; reference uses it >=1536px)."""
        sf = self.config.compression_ratio
        overlap = int(tile_latent_size * tile_overlap_factor)
        stride = tile_latent_size - overlap
        blend = int(tile_latent_size * sf * tile_overlap_factor)

        b, h, w, c = z.shape
        rows = []
        for i in range(0, h, stride):
            row = []
            for j in range(0, w, stride):
                tile = z[:, i : i + tile_latent_size, j : j + tile_latent_size, :]
                row.append(self.decode(params, tile))
            rows.append(row)

        def blend_v(a, b_, extent):
            extent = min(a.shape[1], b_.shape[1], extent)
            t = (jnp.arange(extent) / extent)[None, :, None, None]
            mixed = a[:, -extent:] * (1 - t) + b_[:, :extent] * t
            return jnp.concatenate([b_[:, :0], mixed, b_[:, extent:]], axis=1)

        def blend_h(a, b_, extent):
            extent = min(a.shape[2], b_.shape[2], extent)
            t = (jnp.arange(extent) / extent)[None, None, :, None]
            mixed = a[:, :, -extent:] * (1 - t) + b_[:, :, :extent] * t
            return jnp.concatenate([mixed, b_[:, :, extent:]], axis=2)

        # blend against the *uncropped* neighbors, then crop every tile to
        # row_limit (diffusers semantics; trailing tiles are naturally
        # shorter so the output matches the full-decode size)
        row_limit = tile_latent_size * sf - blend
        out_rows = []
        for i, row in enumerate(rows):
            result_row = []
            for j, tile in enumerate(row):
                if i > 0:
                    tile = blend_v(rows[i - 1][j], tile, blend)
                if j > 0:
                    tile = blend_h(row[j - 1], tile, blend)
                result_row.append(tile[:, :row_limit, :row_limit, :])
            out_rows.append(jnp.concatenate(result_row, axis=2))
        return jnp.concatenate(out_rows, axis=1)
