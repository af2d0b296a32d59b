"""Flux transformer denoiser — TPU-native functional implementation.

Behavioral spec: /root/reference/src/models/flux/denoiser.py (497 LoC):
double-stream (separate img/txt qkv + mlp, joint attention) then
single-stream blocks (fused qkv+mlp linear1/linear2), RMS QK-norm,
3-axis RoPE over [text(zeros), image(y,x)] ids, guidance embedding
(dev/flex variants), final adaLN layer. NHWC latents; param keys flatten
to the reference layout (double_blocks.N.img_attn.qkv.*, ...).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...modules.patch import patchify, unpatchify_cmajor
from ...modules.positional_encoding.rope import RoPEFrequency, apply_rope_qk
from ...nn import LayerNorm, Linear, Module, ModuleDict, RMSNorm, split_keys
from ...nn.core import remat_layer, run_remat_stack, save_name
from ...ops.attention import attention_heads_packed
from .config import DenoiserConfig

DENOISER_TENSOR_PREFIX = "model.diffusion_model."


def timestep_embedding(t: jax.Array, dim: int, max_period: int = 10000,
                       time_factor: float = 1000.0) -> jax.Array:
    """(reference denoiser.py:19-42): cos-first sinusoid of 1000*t."""
    t = time_factor * t.astype(jnp.float32)
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t[:, None] * freqs[None]
    embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        embedding = jnp.concatenate([embedding, jnp.zeros_like(embedding[:, :1])], axis=-1)
    return embedding


class MLPEmbedder(ModuleDict):
    def __init__(self, in_dim: int, hidden_dim: int):
        super().__init__(
            {
                "in_layer": Linear(in_dim, hidden_dim),
                "out_layer": Linear(hidden_dim, hidden_dim),
            }
        )

    def __call__(self, params, x):
        h = self["in_layer"](params["in_layer"], x)
        return self["out_layer"](params["out_layer"], jax.nn.silu(h))


class _FluxRMSNorm(Module):
    """Flux RMSNorm stores the weight as `scale` (reference :56-66)."""

    def __init__(self, dim: int):
        self.dim = dim

    def init(self, key, dtype=jnp.float32):
        return {"scale": jnp.ones((self.dim,), dtype)}

    def __call__(self, params, x):
        dtype = x.dtype
        h = x.astype(jnp.float32)
        h = h * jax.lax.rsqrt(jnp.mean(jnp.square(h), axis=-1, keepdims=True) + 1e-6)
        return h.astype(dtype) * params["scale"].astype(dtype)


class QKNorm(ModuleDict):
    def __init__(self, dim: int):
        super().__init__(
            {"query_norm": _FluxRMSNorm(dim), "key_norm": _FluxRMSNorm(dim)}
        )

    def __call__(self, params, q, k):
        return (
            self["query_norm"](params["query_norm"], q),
            self["key_norm"](params["key_norm"], k),
        )


def _split_heads(qkv: jax.Array, num_heads: int):
    """(B, L, 3*H*D) -> three (B, L, H, D) VIEWS, K-major like the
    reference's einops "B L (K H D) -> K B H L D" but heads-packed: the
    per-head qk-norm / RoPE run on the (B, L, H, D) reshape and attention
    goes straight through the BSHD flash kernel — the (B, H, L, D)
    transposes never exist."""
    b, s, _ = qkv.shape
    qkv = qkv.reshape(b, s, 3, num_heads, -1)
    return qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]


class SelfAttention(ModuleDict):
    def __init__(self, dim: int, num_heads: int, qkv_bias: bool = False):
        self.num_heads = num_heads
        super().__init__(
            {
                "qkv": Linear(dim, dim * 3, bias=qkv_bias),
                "norm": QKNorm(dim // num_heads),
                "proj": Linear(dim, dim),
            }
        )


class Modulation(ModuleDict):
    def __init__(self, dim: int, double: bool):
        self.multiplier = 6 if double else 3
        super().__init__({"lin": Linear(dim, self.multiplier * dim)})

    def __call__(self, params, vec):
        out = self["lin"](params["lin"], jax.nn.silu(vec))[:, None, :]
        return jnp.split(out, self.multiplier, axis=-1)


class DoubleStreamBlock(ModuleDict):
    def __init__(self, hidden_size: int, num_heads: int, mlp_ratio: float,
                 qkv_bias: bool = False, use_flash_attention: bool = False):
        self.num_heads = num_heads
        self.backend = "flash" if use_flash_attention else "xla"
        mlp_hidden = int(hidden_size * mlp_ratio)
        self.norm = LayerNorm(hidden_size, eps=1e-6, elementwise_affine=False)
        super().__init__(
            {
                "img_mod": Modulation(hidden_size, double=True),
                "img_attn": SelfAttention(hidden_size, num_heads, qkv_bias),
                "img_mlp": ModuleDict(
                    {"0": Linear(hidden_size, mlp_hidden), "2": Linear(mlp_hidden, hidden_size)}
                ),
                "txt_mod": Modulation(hidden_size, double=True),
                "txt_attn": SelfAttention(hidden_size, num_heads, qkv_bias),
                "txt_mlp": ModuleDict(
                    {"0": Linear(hidden_size, mlp_hidden), "2": Linear(mlp_hidden, hidden_size)}
                ),
            }
        )

    def _mlp(self, module, params, x):
        # gelu output saved under remat_layer's activation policy
        h = module["0"](params["0"], x)
        h = save_name(jax.nn.gelu(h, approximate=True), "ff_inner")
        return module["2"](params["2"], h)

    def __call__(self, params, img, txt, vec, pe):
        i_shift, i_scale, i_gate, i_shift2, i_scale2, i_gate2 = self["img_mod"](
            params["img_mod"], vec
        )
        t_shift, t_scale, t_gate, t_shift2, t_scale2, t_gate2 = self["txt_mod"](
            params["txt_mod"], vec
        )

        img_mod = (1 + i_scale) * self.norm({}, img) + i_shift
        img_qkv = self["img_attn"]["qkv"](params["img_attn"]["qkv"], img_mod)
        iq, ik, iv = _split_heads(img_qkv, self.num_heads)
        iq, ik = self["img_attn"]["norm"](params["img_attn"]["norm"], iq, ik)

        txt_mod = (1 + t_scale) * self.norm({}, txt) + t_shift
        txt_qkv = self["txt_attn"]["qkv"](params["txt_attn"]["qkv"], txt_mod)
        tq, tk, tv = _split_heads(txt_qkv, self.num_heads)
        tq, tk = self["txt_attn"]["norm"](params["txt_attn"]["norm"], tq, tk)

        q = jnp.concatenate([tq, iq], axis=1)
        k = jnp.concatenate([tk, ik], axis=1)
        v = jnp.concatenate([tv, iv], axis=1)
        q, k = apply_rope_qk(q, k, pe[:, None])
        b, s, h, d = q.shape
        attn = attention_heads_packed(
            q.reshape(b, s, h * d), k.reshape(b, s, h * d),
            v.reshape(b, s, h * d), h, backend=self.backend,
        )
        txt_len = txt.shape[1]
        txt_attn, img_attn = attn[:, :txt_len], attn[:, txt_len:]

        img = img + i_gate * self["img_attn"]["proj"](params["img_attn"]["proj"], img_attn)
        img = save_name(img, "res_stream")
        img = img + i_gate2 * self._mlp(
            self["img_mlp"], params["img_mlp"], (1 + i_scale2) * self.norm({}, img) + i_shift2
        )
        txt = txt + t_gate * self["txt_attn"]["proj"](params["txt_attn"]["proj"], txt_attn)
        txt = save_name(txt, "res_stream")
        txt = txt + t_gate2 * self._mlp(
            self["txt_mlp"], params["txt_mlp"], (1 + t_scale2) * self.norm({}, txt) + t_shift2
        )
        return img, txt


class SingleStreamBlock(ModuleDict):
    def __init__(self, hidden_size: int, num_heads: int, mlp_ratio: float = 4.0,
                 use_flash_attention: bool = False):
        self.hidden_size = hidden_size
        self.num_heads = num_heads
        self.mlp_hidden_dim = int(hidden_size * mlp_ratio)
        self.backend = "flash" if use_flash_attention else "xla"
        self.pre_norm = LayerNorm(hidden_size, eps=1e-6, elementwise_affine=False)
        super().__init__(
            {
                "linear1": Linear(hidden_size, hidden_size * 3 + self.mlp_hidden_dim),
                "linear2": Linear(hidden_size + self.mlp_hidden_dim, hidden_size),
                "norm": QKNorm(hidden_size // num_heads),
                "modulation": Modulation(hidden_size, double=False),
            }
        )

    def __call__(self, params, x, vec, pe):
        shift, scale, gate = self["modulation"](params["modulation"], vec)
        x_mod = (1 + scale) * self.pre_norm({}, x) + shift
        h = self["linear1"](params["linear1"], x_mod)
        qkv, mlp = jnp.split(h, [3 * self.hidden_size], axis=-1)
        q, k, v = _split_heads(qkv, self.num_heads)
        q, k = self["norm"](params["norm"], q, k)
        q, k = apply_rope_qk(q, k, pe[:, None])
        b, s, hh, d = q.shape
        attn = attention_heads_packed(
            q.reshape(b, s, hh * d), k.reshape(b, s, hh * d),
            v.reshape(b, s, hh * d), hh, backend=self.backend,
        )
        output = self["linear2"](
            params["linear2"],
            save_name(
                jnp.concatenate([attn, jax.nn.gelu(mlp, approximate=True)], axis=2),
                "ff_inner",
            ),
        )
        return x + gate * output


class LastLayer(ModuleDict):
    def __init__(self, hidden_size: int, patch_size: int, out_channels: int):
        self.norm_final = LayerNorm(hidden_size, eps=1e-6, elementwise_affine=False)
        super().__init__(
            {
                "linear": Linear(hidden_size, patch_size * patch_size * out_channels),
                "adaLN_modulation": ModuleDict({"1": Linear(hidden_size, 2 * hidden_size)}),
            }
        )

    def __call__(self, params, x, vec):
        mod = self["adaLN_modulation"]["1"](
            params["adaLN_modulation"]["1"], jax.nn.silu(vec)
        )
        shift, scale = jnp.split(mod, 2, axis=1)
        x = (1 + scale[:, None, :]) * self.norm_final({}, x) + shift[:, None, :]
        return self["linear"](params["linear"], x)


class Flux(Module):
    def __init__(self, config: DenoiserConfig):
        self.config = config
        self.params_config = config
        self.hidden_size = config.hidden_size
        self.num_heads = config.num_heads
        self.patch_size = config.patch_size
        self.vae_channels = config.vae_channels
        if config.hidden_size % config.num_heads != 0:
            raise ValueError("hidden_size must be divisible by num_heads")
        pe_dim = config.hidden_size // config.num_heads
        if sum(config.axes_dim) != pe_dim:
            raise ValueError(f"Got {config.axes_dim} but expected positional dim {pe_dim}")
        self.gradient_checkpointing = False
        self._pipeline = None  # (mesh, num_microbatches, axis) — set_pipeline

        self.rope_frequency = RoPEFrequency(config.axes_dim, config.theta)
        self.img_in = Linear(config.in_channels, config.hidden_size)
        self.time_in = MLPEmbedder(256, config.hidden_size)
        self.vector_in = MLPEmbedder(config.vec_in_dim, config.hidden_size)
        self.guidance_in = MLPEmbedder(256, config.hidden_size) if config.guidance_embed else None
        self.txt_in = Linear(config.context_in_dim, config.hidden_size)
        self.double_blocks = [
            DoubleStreamBlock(config.hidden_size, config.num_heads, config.mlp_ratio,
                              config.qkv_bias, config.use_flash_attention)
            for _ in range(config.depth)
        ]
        self.single_blocks = [
            SingleStreamBlock(config.hidden_size, config.num_heads, config.mlp_ratio,
                              config.use_flash_attention)
            for _ in range(config.depth_single_blocks)
        ]
        self.final_layer = LastLayer(config.hidden_size, 1, config.out_channels)

    def init(self, key, dtype=jnp.float32):
        names = ["img_in", "time_in", "vector_in", "guidance_in", "txt_in",
                 "double", "single", "final"]
        keys = split_keys(key, names)

        def stack(blocks, k):
            ks = jax.random.split(k, max(len(blocks), 1))
            return {str(i): b.init(kk, dtype) for i, (b, kk) in enumerate(zip(blocks, ks))}

        params = {
            "img_in": self.img_in.init(keys["img_in"], dtype),
            "time_in": self.time_in.init(keys["time_in"], dtype),
            "vector_in": self.vector_in.init(keys["vector_in"], dtype),
            "txt_in": self.txt_in.init(keys["txt_in"], dtype),
            "double_blocks": stack(self.double_blocks, keys["double"]),
            "single_blocks": stack(self.single_blocks, keys["single"]),
            "final_layer": self.final_layer.init(keys["final"], dtype),
        }
        if self.guidance_in is not None:
            params["guidance_in"] = self.guidance_in.init(keys["guidance_in"], dtype)
        return params

    def set_gradient_checkpointing(self, enabled: bool):
        self.gradient_checkpointing = enabled

    def set_pipeline(self, mesh, num_microbatches: int, axis: str = "pipe"):
        """Opt-in GPipe pipelining (parallel/pipeline.py). Each stack is
        pipelined only if its depth divides the pipe size — Flux-dev's 19
        double blocks are prime, so a pipe of 2 pipelines the 38 single
        blocks (~half the 12B params) and runs doubles sequentially
        (compose with fsdp for the rest). At least one stack must divide.
        ``set_pipeline(None, 1)`` disables."""
        if mesh is None:
            self._pipeline = None
            return
        p = mesh.shape[axis]
        assert (
            len(self.double_blocks) % p == 0 or len(self.single_blocks) % p == 0
        ), (len(self.double_blocks), len(self.single_blocks), p)
        self._pipeline = (mesh, num_microbatches, axis)

    def _prepare_tokens(
        self,
        params,
        latent: jax.Array,
        t5_hidden_states: jax.Array,
        timesteps: jax.Array,
        clip_hidden_states: jax.Array,
        guidance: Optional[jax.Array],
    ):
        """Input projections, the modulation vector and RoPE tables.
        Shared by ``__call__`` and ``deepcache_forward``."""
        b, height, width, _ = latent.shape
        p = self.patch_size

        patches = patchify(latent, p)  # (c, ph, pw) feature order
        img = self.img_in(params["img_in"], patches)
        txt = self.txt_in(params["txt_in"], t5_hidden_states)

        vec = self.time_in(
            params["time_in"],
            timestep_embedding(timesteps, 256).astype(img.dtype),
        )
        if self.config.guidance_embed and guidance is not None:
            # reference gates on guidance.max() > 0 (data-dependent python
            # branch, denoiser.py:441); jit-safe multiply instead
            gate = (jnp.max(guidance) > 0).astype(img.dtype)
            vec = vec + gate * self.guidance_in(
                params["guidance_in"],
                timestep_embedding(guidance, 256).astype(img.dtype),
            )
        vec = vec + self.vector_in(params["vector_in"], clip_hidden_states)

        txt_ids = self.rope_frequency.get_text_position_indices(txt.shape[1])
        img_ids = self.rope_frequency.get_image_position_indices(height, width)
        pe = self.rope_frequency(np.concatenate([txt_ids, img_ids], axis=0))
        return img, txt, vec, pe, height, width

    def _run_single_range(self, params, x, vec, pe, start: int = 0, end=None):
        """Single (joint-sequence) blocks [start, end) as a plain stack,
        checkpointed in groups of nn.core.remat_group() layers."""
        end = len(self.single_blocks) if end is None else end
        return run_remat_stack(
            lambda block, pp, xx: block(pp, xx, vec, pe),
            self.single_blocks[start:end],
            [params["single_blocks"][str(i)] for i in range(start, end)],
            x,
            self.gradient_checkpointing,
        )

    def _finish(self, params, img, vec, height: int, width: int):
        p = self.patch_size
        img = self.final_layer(params["final_layer"], img, vec)
        return unpatchify_cmajor(img, height // p, width // p, p, self.vae_channels)

    def __call__(
        self,
        params,
        latent: jax.Array,  # (B, H, W, C) NHWC, C = vae_channels
        t5_hidden_states: jax.Array,
        timesteps: jax.Array,
        clip_hidden_states: jax.Array,
        guidance: Optional[jax.Array] = None,
    ) -> jax.Array:
        img, txt, vec, pe, height, width = self._prepare_tokens(
            params, latent, t5_hidden_states, timesteps, clip_hidden_states,
            guidance,
        )

        wrap = remat_layer if self.gradient_checkpointing else None
        pipe = self._pipeline
        if pipe is not None and len(self.double_blocks) % pipe[0].shape[pipe[2]] == 0:
            from ...parallel.pipeline import run_pipelined_stack

            mesh, num_mb, axis = pipe
            dblock = self.double_blocks[0]

            def double_fn(lp, carry, static):
                im, tx = dblock(lp, carry["img"], carry["txt"], carry["vec"], static)
                return {"img": im, "txt": tx, "vec": carry["vec"]}

            out = run_pipelined_stack(
                double_fn,
                [params["double_blocks"][str(i)] for i in range(len(self.double_blocks))],
                {"img": img, "txt": txt, "vec": vec},
                pe, mesh, num_mb, axis=axis, wrap=wrap,
            )
            img, txt = out["img"], out["txt"]
        else:
            img, txt = run_remat_stack(
                lambda block, pp, it: block(pp, it[0], it[1], vec, pe),
                self.double_blocks,
                [params["double_blocks"][str(i)] for i in range(len(self.double_blocks))],
                (img, txt),
                self.gradient_checkpointing,
            )

        x = jnp.concatenate([txt, img], axis=1)
        if pipe is not None and len(self.single_blocks) % pipe[0].shape[pipe[2]] == 0:
            from ...parallel.pipeline import run_pipelined_stack

            mesh, num_mb, axis = pipe
            sblock = self.single_blocks[0]

            def single_fn(lp, carry, static):
                return {"x": sblock(lp, carry["x"], carry["vec"], static),
                        "vec": carry["vec"]}

            x = run_pipelined_stack(
                single_fn,
                [params["single_blocks"][str(i)] for i in range(len(self.single_blocks))],
                {"x": x, "vec": vec},
                pe, mesh, num_mb, axis=axis, wrap=wrap,
            )["x"]
        else:
            x = self._run_single_range(params, x, vec, pe)
        img = x[:, txt.shape[1]:]

        return self._finish(params, img, vec, height, width)

    def deepcache_forward(
        self,
        params,
        latent: jax.Array,
        t5_hidden_states: jax.Array,
        timesteps: jax.Array,
        clip_hidden_states: jax.Array,
        guidance: Optional[jax.Array] = None,
        cached_delta: Optional[jax.Array] = None,
        refresh: bool = True,
        cache_depth: Optional[int] = None,
    ):
        """DeepCache-style step caching (same Delta-DiT scheme as the
        Lumina2/AuraFlow/CogView4 variants; beyond the reference, which has
        no step caching). The double blocks always run; the single joint
        stack is residual, so a full (``refresh=True``) step records
        ``delta = x_N - x_k`` of the deep suffix [k, N) and a cached step
        runs only the shallow prefix fresh and adds the cached delta.
        Returns ``(output, delta)``."""
        assert self._pipeline is None, "DeepCache is an inference-only path"
        n = len(self.single_blocks)
        k = cache_depth if cache_depth is not None else max(1, n // 4)
        assert 0 < k < n, (k, n)

        img, txt, vec, pe, height, width = self._prepare_tokens(
            params, latent, t5_hidden_states, timesteps, clip_hidden_states,
            guidance,
        )
        for i, block in enumerate(self.double_blocks):
            img, txt = block(params["double_blocks"][str(i)], img, txt, vec, pe)
        x = jnp.concatenate([txt, img], axis=1)
        x = self._run_single_range(params, x, vec, pe, 0, k)
        if refresh:
            shallow = x
            x = self._run_single_range(params, x, vec, pe, k, n)
            delta = x - shallow
        else:
            assert cached_delta is not None
            x = x + cached_delta.astype(x.dtype)
            delta = cached_delta
        img = x[:, txt.shape[1]:]
        out = self._finish(params, img, vec, height, width)
        return out, delta


class Denoiser(Flux):
    @classmethod
    def from_config(cls, config: DenoiserConfig) -> "Denoiser":
        return cls(config)
