"""Wan 2.2 3D causal video VAE — native TPU implementation.

The reference delegates this entirely to diffusers ``AutoencoderKLWan``
(/root/reference/src/models/wan/vae.py:1-2, 136-149); per SURVEY §2.9
external native deps get TPU-native equivalents, so this implements the
architecture from scratch in NFHWC:

- ``CausalConv3d``: front-padded (causal) time axis; evaluated as kt
  shifted 2-D convolutions so every tap rides the channel-contraction
  matmul fast paths of ``nn.Conv2d`` (the same C-minor rule the image
  VAEs follow — lax.conv3d would radiate relayout copies).
- Encoder: patchify(p=2) -> conv_in -> 4 residual down stages (2 resnets
  each; spatial downsample after stages 0-2, temporal after 1-2; each
  stage carries an avg-pool shortcut — the Wan 2.2 ``is_residual`` form)
  -> mid (res/attn/res) -> RMS norm -> conv_out (2*z moments).
- Decoder mirrors with nearest-upsample resamples, channel-duplicating
  shortcuts, and the causal first-frame rule (temporal upsample emits
  2F-1 frames: frame 0 is never duplicated).
- RMS norms are channel-L2 norms * sqrt(C) * gamma (diffusers
  WanRMS_norm); attention is single-head spatial attention per frame.

Compression: 4x temporal (two stride-2 causal time convs: 1+4k frames ->
1+k latents), 16x spatial (3 conv downsamples x 2 patch). z_dim = 48.

Param keys follow the diffusers module tree (encoder.down_blocks.N...,
decoder.up_blocks.N..., quant_conv, post_quant_conv) so converted
checkpoints load by name; exact byte-parity with diffusers cannot be
asserted in this environment (no diffusers), so tests pin the structural
contracts instead: shape arithmetic, causality, encode/decode round trip.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ...nn import Conv2d, Module, ModuleDict, split_keys
from ...nn.core import unflatten_params
from ...ops.attention import scaled_dot_product_attention
from .vae import DEFAULT_VAE_CONFIG, LATENT_MEAN, VAE


@dataclass
class WanVAEConfig:
    base_dim: int = 160
    decoder_base_dim: int = 256
    z_dim: int = 48
    dim_mult: tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_scales: tuple[float, ...] = ()
    temperal_downsample: tuple[bool, ...] = (False, True, True)  # sic
    in_channels: int = 12
    out_channels: int = 12
    patch_size: int = 2
    is_residual: bool = True

    @classmethod
    def from_default(cls) -> "WanVAEConfig":
        c = DEFAULT_VAE_CONFIG
        return cls(
            base_dim=c["base_dim"],
            decoder_base_dim=c["decoder_base_dim"],
            z_dim=c["z_dim"],
            dim_mult=tuple(c["dim_mult"]),
            num_res_blocks=c["num_res_blocks"],
            attn_scales=tuple(c["attn_scales"]),
            temperal_downsample=tuple(c["temperal_downsample"]),
            in_channels=c["in_channels"],
            out_channels=c["out_channels"],
            patch_size=c["patch_size"],
            is_residual=c["is_residual"],
        )


# ---------------------------------------------------------------------------
# primitive modules


class CausalConv3d(Module):
    """3-D conv, causal in time: weight (O, I, kt, kh, kw) (torch key
    layout), evaluated as kt shifted 2-D convs over (B*F, H, W, C)."""

    def __init__(self, in_ch: int, out_ch: int, kernel, stride=1, spatial_padding=None):
        kt, kh, kw = kernel if isinstance(kernel, tuple) else (kernel,) * 3
        st, ss = stride if isinstance(stride, tuple) else (stride, stride)
        assert kh == kw, "square spatial kernels only"
        self.in_ch, self.out_ch = in_ch, out_ch
        self.kt, self.kh = kt, kh
        self.st, self.ss = st, ss
        self.spatial_padding = kh // 2 if spatial_padding is None else spatial_padding
        self._tap = Conv2d(in_ch, out_ch, kh, stride=ss, padding=self.spatial_padding)

    def init(self, key, dtype=jnp.float32):
        fan_in = self.in_ch * self.kt * self.kh * self.kh
        bound = 1.0 / np.sqrt(fan_in)
        wkey, bkey = jax.random.split(key)
        return {
            "weight": jax.random.uniform(
                wkey, (self.out_ch, self.in_ch, self.kt, self.kh, self.kh),
                dtype, -bound, bound,
            ),
            "bias": jax.random.uniform(bkey, (self.out_ch,), dtype, -bound, bound),
        }

    def __call__(self, params, x):
        """x: (B, F, H, W, C) -> (B, F', H', W', O) with F' = (F-1)//st + 1."""
        b, f, h, w, _ = x.shape
        weight = params["weight"]
        xp = jnp.pad(x, ((0, 0), (self.kt - 1, 0), (0, 0), (0, 0), (0, 0)))
        f_out = (f - 1) // self.st + 1
        y = None
        for dt in range(self.kt):
            frames = xp[:, dt : dt + (f_out - 1) * self.st + 1 : self.st]
            flat = frames.reshape((b * f_out,) + frames.shape[2:])
            tap = self._tap({"weight": weight[:, :, dt]}, flat)
            y = tap if y is None else y + tap
        y = y + params["bias"].astype(y.dtype)
        return y.reshape((b, f_out) + y.shape[1:])


class WanRMSNorm(Module):
    """Channel L2-normalize * sqrt(C) * gamma (diffusers WanRMS_norm)."""

    def __init__(self, dim: int):
        self.dim = dim

    def init(self, key, dtype=jnp.float32):
        return {"gamma": jnp.ones((self.dim,), dtype)}

    def __call__(self, params, x):
        xf = x.astype(jnp.float32)
        inv = jax.lax.rsqrt(jnp.sum(xf * xf, axis=-1, keepdims=True) + 1e-12)
        y = xf * inv * np.sqrt(self.dim)
        return (y * params["gamma"].astype(jnp.float32)).astype(x.dtype)


class ResidualBlock3d(ModuleDict):
    def __init__(self, in_ch: int, out_ch: int):
        self.has_shortcut = in_ch != out_ch
        children = {
            "norm1": WanRMSNorm(in_ch),
            "conv1": CausalConv3d(in_ch, out_ch, 3),
            "norm2": WanRMSNorm(out_ch),
            "conv2": CausalConv3d(out_ch, out_ch, 3),
        }
        if self.has_shortcut:
            children["conv_shortcut"] = CausalConv3d(in_ch, out_ch, 1)
        super().__init__(children)

    def __call__(self, params, x):
        h = self["conv1"](params["conv1"], jax.nn.silu(self["norm1"](params["norm1"], x)))
        h = self["conv2"](params["conv2"], jax.nn.silu(self["norm2"](params["norm2"], h)))
        if self.has_shortcut:
            x = self["conv_shortcut"](params["conv_shortcut"], x)
        return x + h


class AttentionBlock3d(ModuleDict):
    """Single-head spatial self-attention, applied per frame."""

    def __init__(self, dim: int):
        self.dim = dim
        super().__init__(
            {
                "norm": WanRMSNorm(dim),
                "to_qkv": Conv2d(dim, dim * 3, 1),
                "proj": Conv2d(dim, dim, 1),
            }
        )

    def __call__(self, params, x):
        b, f, h, w, c = x.shape
        residual = x
        t = self["norm"](params["norm"], x).reshape(b * f, h, w, c)
        qkv = self["to_qkv"](params["to_qkv"], t).reshape(b * f, h * w, 3 * c)
        q, k, v = jnp.split(qkv[:, None], 3, axis=-1)  # (bf, 1 head, hw, c)
        attn = scaled_dot_product_attention(q, k, v)[:, 0]
        out = self["proj"](params["proj"], attn.reshape(b * f, h, w, c))
        return out.reshape(b, f, h, w, c) + residual


class Resample(ModuleDict):
    """Spatial (and optionally temporal) resample (diffusers WanResample).

    down: zero-pad (0,1,0,1) + stride-2 conv [+ stride-2 causal time conv]
    up: nearest 2x + 3x3 conv to out_dim [+ time conv emitting 2F-1 frames]
    """

    def __init__(self, dim: int, mode: str, out_dim: int | None = None):
        self.mode = mode
        children = {}
        if mode.startswith("downsample"):
            children["resample"] = ModuleDict(
                {"1": Conv2d(dim, dim, 3, stride=2, padding=0)}
            )
            if mode == "downsample3d":
                children["time_conv"] = CausalConv3d(
                    dim, dim, (3, 1, 1), stride=(2, 1)
                )
        elif mode.startswith("upsample"):
            out_dim = out_dim if out_dim is not None else dim // 2
            children["resample"] = ModuleDict(
                {"1": Conv2d(dim, out_dim, 3, padding=1)}
            )
            if mode == "upsample3d":
                children["time_conv"] = CausalConv3d(dim, dim * 2, (3, 1, 1))
        else:
            raise ValueError(mode)
        super().__init__(children)

    def __call__(self, params, x):
        b, f, h, w, c = x.shape
        if self.mode.startswith("downsample"):
            flat = jnp.pad(
                x.reshape(b * f, h, w, c), ((0, 0), (0, 1), (0, 1), (0, 0))
            )
            y = self["resample"]["1"](params["resample"]["1"], flat)
            y = y.reshape((b, f) + y.shape[1:])
            if self.mode == "downsample3d":
                y = self["time_conv"](params["time_conv"], y)
            return y
        # upsample: temporal duplication first (causal: frame 0 stays
        # single, so F -> 2F-1), then nearest 2x spatial + conv
        if self.mode == "upsample3d":
            y = self["time_conv"](params["time_conv"], x)  # (B, F, H, W, 2C)
            y = y.reshape(b, f, h, w, 2, c).transpose(0, 1, 4, 2, 3, 5)
            y = y.reshape(b, 2 * f, h, w, c)[:, 1:]
            x = y
            b, f = x.shape[0], x.shape[1]
        flat = x.reshape(b * f, x.shape[2], x.shape[3], x.shape[4])
        up = jnp.repeat(jnp.repeat(flat, 2, axis=1), 2, axis=2)
        y = self["resample"]["1"](params["resample"]["1"], up)
        return y.reshape((b, f) + y.shape[1:])


def _avg_down(x, out_ch: int, ft: int, fs: int):
    """Parameter-free avg-pool shortcut (diffusers WanAvgDown): space/time
    factors fold into channels, then grouped mean to out_ch. Time is
    front-padded by replicating frame 0 (causal)."""
    b, f, h, w, c = x.shape
    pad = (ft - f % ft) % ft
    if pad:
        x = jnp.concatenate([jnp.repeat(x[:, :1], pad, axis=1), x], axis=1)
        f = f + pad
    x = x.reshape(b, f // ft, ft, h // fs, fs, w // fs, fs, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
        b, f // ft, h // fs, w // fs, ft * fs * fs * c
    )
    group = (ft * fs * fs * c) // out_ch
    return x.reshape(x.shape[:4] + (out_ch, group)).mean(axis=-1)


def _dup_up(x, out_ch: int, ft: int, fs: int):
    """Inverse shortcut (diffusers WanDup): repeat channels into
    space/time factors; the duplicated leading frames are dropped so
    F -> ft*F - (ft-1) (frame 0 single, causal)."""
    b, f, h, w, c = x.shape
    factor = ft * fs * fs
    repeat = (out_ch * factor) // c
    x = jnp.repeat(x, repeat, axis=-1)  # (..., factor * out_ch)
    x = x.reshape(b, f, h, w, ft, fs, fs, out_ch)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(b, f * ft, h * fs, w * fs, out_ch)
    return x[:, ft - 1 :]


# ---------------------------------------------------------------------------
# encoder / decoder stages


class DownStage(ModuleDict):
    """num_res_blocks resnets + optional resample, with an avg-pool
    shortcut across the whole stage (Wan 2.2 WanResidualDownBlock)."""

    def __init__(self, in_ch: int, out_ch: int, num_res: int,
                 temporal_down: bool, spatial_down: bool, is_residual: bool):
        self.ft = 2 if temporal_down else 1
        self.fs = 2 if spatial_down else 1
        self.out_ch = out_ch
        self.is_residual = is_residual
        children = {
            "resnets": ModuleDict(
                {
                    str(i): ResidualBlock3d(in_ch if i == 0 else out_ch, out_ch)
                    for i in range(num_res)
                }
            )
        }
        if spatial_down:
            children["downsampler"] = Resample(
                out_ch, "downsample3d" if temporal_down else "downsample2d"
            )
        super().__init__(children)

    def __call__(self, params, x):
        shortcut = x
        for i in range(len(self["resnets"].children)):
            x = self["resnets"][str(i)](params["resnets"][str(i)], x)
        if "downsampler" in self.children:
            x = self["downsampler"](params["downsampler"], x)
        if self.is_residual:
            x = x + _avg_down(shortcut, self.out_ch, self.ft, self.fs)
        return x


class UpStage(ModuleDict):
    def __init__(self, in_ch: int, out_ch: int, num_res: int,
                 temporal_up: bool, spatial_up: bool, is_residual: bool):
        self.ft = 2 if temporal_up else 1
        self.fs = 2 if spatial_up else 1
        self.out_ch = out_ch
        self.is_residual = is_residual
        children = {
            "resnets": ModuleDict(
                {
                    str(i): ResidualBlock3d(in_ch if i == 0 else in_ch, in_ch)
                    for i in range(num_res)
                }
            )
        }
        if spatial_up:
            children["upsampler"] = Resample(
                in_ch, "upsample3d" if temporal_up else "upsample2d", out_dim=out_ch
            )
        super().__init__(children)

    def __call__(self, params, x):
        shortcut = x
        for i in range(len(self["resnets"].children)):
            x = self["resnets"][str(i)](params["resnets"][str(i)], x)
        if "upsampler" in self.children:
            x = self["upsampler"](params["upsampler"], x)
        if self.is_residual:
            x = x + _dup_up(shortcut, self.out_ch, self.ft, self.fs)
        return x


class MidBlock3d(ModuleDict):
    def __init__(self, dim: int):
        super().__init__(
            {
                "resnets": ModuleDict(
                    {"0": ResidualBlock3d(dim, dim), "1": ResidualBlock3d(dim, dim)}
                ),
                "attentions": ModuleDict({"0": AttentionBlock3d(dim)}),
            }
        )

    def __call__(self, params, x):
        x = self["resnets"]["0"](params["resnets"]["0"], x)
        x = self["attentions"]["0"](params["attentions"]["0"], x)
        return self["resnets"]["1"](params["resnets"]["1"], x)


class Encoder3d(ModuleDict):
    def __init__(self, config: WanVAEConfig):
        dims = [config.base_dim * m for m in config.dim_mult]
        stages: dict[str, Module] = {}
        in_ch = dims[0]
        for i, out_ch in enumerate(dims):
            spatial_down = i != len(dims) - 1
            temporal_down = spatial_down and config.temperal_downsample[i]
            stages[str(i)] = DownStage(
                in_ch, out_ch, config.num_res_blocks,
                temporal_down, spatial_down, config.is_residual,
            )
            in_ch = out_ch
        super().__init__(
            {
                "conv_in": CausalConv3d(config.in_channels, dims[0], 3),
                "down_blocks": ModuleDict(stages),
                "mid_block": MidBlock3d(dims[-1]),
                "norm_out": WanRMSNorm(dims[-1]),
                "conv_out": CausalConv3d(dims[-1], config.z_dim * 2, 3),
            }
        )

    def __call__(self, params, x):
        x = self["conv_in"](params["conv_in"], x)
        for i in range(len(self["down_blocks"].children)):
            x = self["down_blocks"][str(i)](params["down_blocks"][str(i)], x)
        x = self["mid_block"](params["mid_block"], x)
        x = jax.nn.silu(self["norm_out"](params["norm_out"], x))
        return self["conv_out"](params["conv_out"], x)


class Decoder3d(ModuleDict):
    def __init__(self, config: WanVAEConfig):
        dims = [config.decoder_base_dim * m for m in reversed(config.dim_mult)]
        # mirror of the encoder: spatial upsample after all but the last
        # stage; temporal upsample mirrors temperal_downsample reversed
        stages: dict[str, Module] = {}
        for i in range(len(dims)):
            in_ch = dims[i]
            out_ch = dims[i + 1] if i + 1 < len(dims) else dims[-1]
            spatial_up = i != len(dims) - 1
            temporal_up = spatial_up and list(reversed(config.temperal_downsample))[i]
            stages[str(i)] = UpStage(
                in_ch, out_ch, config.num_res_blocks + 1,
                temporal_up, spatial_up, config.is_residual,
            )
        super().__init__(
            {
                "conv_in": CausalConv3d(config.z_dim, dims[0], 3),
                "mid_block": MidBlock3d(dims[0]),
                "up_blocks": ModuleDict(stages),
                "norm_out": WanRMSNorm(dims[-1]),
                "conv_out": CausalConv3d(dims[-1], config.out_channels, 3),
            }
        )

    def __call__(self, params, z):
        x = self["conv_in"](params["conv_in"], z)
        x = self["mid_block"](params["mid_block"], x)
        for i in range(len(self["up_blocks"].children)):
            x = self["up_blocks"][str(i)](params["up_blocks"][str(i)], x)
        x = jax.nn.silu(self["norm_out"](params["norm_out"], x))
        return self["conv_out"](params["conv_out"], x)


# ---------------------------------------------------------------------------
# full model


class CausalVAE(VAE, Module):
    """Native AutoencoderKLWan. Holds its own params (the pipeline treats
    the VAE as a frozen object, reference vae.py:136-149)."""

    def __init__(self, config: WanVAEConfig | None = None, dtype=jnp.float32):
        self.config = config or WanVAEConfig.from_default()
        self.dtype = dtype
        cfg = self.config
        # instance-level compression bookkeeping (the VAE protocol's class
        # attrs describe only the default 48-ch config)
        self.latent_dim = cfg.z_dim
        n_spatial = len(cfg.dim_mult) - 1
        self.spatial_compression_ratio = (2**n_spatial) * cfg.patch_size
        self.temporal_compression_ratio = 2 ** sum(
            bool(t) for t in cfg.temperal_downsample
        )
        if cfg.z_dim != len(LATENT_MEAN):
            # non-default latent width (tiny test configs): identity stats
            self._shift = jnp.zeros((1, 1, 1, 1, cfg.z_dim), jnp.float32)
            self._scale = jnp.ones((1, 1, 1, 1, cfg.z_dim), jnp.float32)
        else:
            self._shift = None
            self._scale = None
        self.encoder = Encoder3d(self.config)
        self.decoder = Decoder3d(self.config)
        self.quant_conv = CausalConv3d(self.config.z_dim * 2, self.config.z_dim * 2, 1)
        self.post_quant_conv = CausalConv3d(self.config.z_dim, self.config.z_dim, 1)
        self.params = None
        self._encode_jit = None
        self._decode_jit = None

    @property
    def shift_factor(self) -> jax.Array:
        return VAE.shift_factor.fget(self) if self._shift is None else self._shift

    @property
    def scaling_factor(self) -> jax.Array:
        return VAE.scaling_factor.fget(self) if self._scale is None else self._scale

    # -- params ------------------------------------------------------------

    def init(self, key, dtype=None):
        dtype = dtype or self.dtype
        keys = split_keys(key, ["encoder", "decoder", "quant", "post_quant"])
        return {
            "encoder": self.encoder.init(keys["encoder"], dtype),
            "decoder": self.decoder.init(keys["decoder"], dtype),
            "quant_conv": self.quant_conv.init(keys["quant"], dtype),
            "post_quant_conv": self.post_quant_conv.init(keys["post_quant"], dtype),
        }

    def init_random(self, seed: int = 0):
        self.params = self.init(jax.random.PRNGKey(seed))
        return self

    def load_state_dict(self, state_dict):
        self.params = unflatten_params(
            {k: jnp.asarray(v) for k, v in state_dict.items()}
        )
        self._encode_jit = self._decode_jit = None
        return self

    def _require_params(self):
        if self.params is None:
            raise RuntimeError(
                "Wan VAE has no params — call load_state_dict() or init_random()"
            )

    # -- patchify ----------------------------------------------------------

    def _patchify(self, video):
        p = self.config.patch_size
        b, f, h, w, c = video.shape
        x = video.reshape(b, f, h // p, p, w // p, p, c)
        return x.transpose(0, 1, 2, 4, 3, 5, 6).reshape(
            b, f, h // p, w // p, p * p * c
        )

    def _unpatchify(self, x):
        p = self.config.patch_size
        b, f, h, w, c = x.shape
        out_c = c // (p * p)
        x = x.reshape(b, f, h, w, p, p, out_c)
        return x.transpose(0, 1, 2, 4, 3, 5, 6).reshape(b, f, h * p, w * p, out_c)

    # -- public API --------------------------------------------------------

    def encode_moments(self, video: jax.Array) -> jax.Array:
        """(B, F, H, W, 3) -> (B, F', H', W', 2*z) mean/logvar moments."""
        self._require_params()
        if self._encode_jit is None:
            def run(params, video):
                x = self._patchify(video.astype(self.dtype))
                moments = self.encoder(params["encoder"], x)
                return self.quant_conv(params["quant_conv"], moments)

            self._encode_jit = jax.jit(run)
        return self._encode_jit(self.params, video)

    def encode(self, video: jax.Array) -> jax.Array:
        """(B, F, H, W, 3) in [-1, 1] -> raw latent mean (B, F', H', W', z)."""
        moments = self.encode_moments(video)
        mean, _ = jnp.split(moments, 2, axis=-1)
        return mean

    def decode(self, latents: jax.Array) -> jax.Array:
        """raw latents (B, F', H', W', z) -> (B, F, H, W, 3) in [-1, 1]."""
        self._require_params()
        if self._decode_jit is None:
            def run(params, z):
                x = self.post_quant_conv(params["post_quant_conv"], z.astype(self.dtype))
                x = self.decoder(params["decoder"], x)
                return jnp.clip(self._unpatchify(x), -1.0, 1.0)

            self._decode_jit = jax.jit(run)
        return self._decode_jit(self.params, latents)

    @classmethod
    def from_default(cls) -> "CausalVAE":
        return cls(WanVAEConfig.from_default())
