"""CogView4 DiT denoiser — TPU-native functional implementation.

Behavioral spec: /root/reference/src/models/cogview4/denoiser.py (694 LoC):
joint [text | image] attention with fp32 QK-LayerNorm (no affine), 12-way
dual adaLN per block, SDXL-like size conditioning (sincos of
original/crop/target sizes), 2-axis interleaved RoPE applied to the image
part only, shared FF for both streams, final adaLN + projection. NHWC
latents; param keys flatten to the reference layout.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...modules.patch import patchify, unpatchify_cmajor
from ...modules.timestep.embedding import TimestepEmbedding, get_timestep_embedding
from ...nn import LayerNorm, Linear, Module, ModuleDict, split_keys
from ...nn.core import remat_layer, run_remat_stack, save_name
from ...ops.attention import attention_heads_packed
from .config import DenoiserConfig

DENOISER_TENSOR_PREFIX = "diffusion_model."


class GlobalConditionEmbedding(ModuleDict):
    """timestep sinusoid + 3x2 size sincos -> MLPs -> silu
    (reference denoiser.py:27-109)."""

    def __init__(self, embedding_dim: int, condition_dim: int,
                 pooled_projection_dim: int, timesteps_dim: int = 256):
        self.condition_dim = condition_dim
        self.timesteps_dim = timesteps_dim
        super().__init__(
            {
                "timestep_embedder": TimestepEmbedding(timesteps_dim, embedding_dim),
                "condition_embedder": TimestepEmbedding(pooled_projection_dim, embedding_dim),
            }
        )

    def __call__(self, params, timestep, original_size, target_size, crop_coords, dtype):
        t_proj = get_timestep_embedding(
            timestep, self.timesteps_dim, flip_sin_to_cos=True, downscale_freq_shift=0.0
        )

        def cond(v):
            return get_timestep_embedding(
                v.reshape(-1), self.condition_dim,
                flip_sin_to_cos=True, downscale_freq_shift=0.0,
            ).reshape(v.shape[0], -1)

        condition = jnp.concatenate(
            [cond(original_size), cond(crop_coords), cond(target_size)], axis=1
        )
        t_emb = self["timestep_embedder"](params["timestep_embedder"], t_proj.astype(dtype))
        c_emb = self["condition_embedder"](params["condition_embedder"], condition.astype(dtype))
        return jax.nn.silu(t_emb + c_emb)


def _qk_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    dtype = x.dtype
    h = x.astype(jnp.float32)
    mean = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(h - mean), axis=-1, keepdims=True)
    return ((h - mean) * jax.lax.rsqrt(var + eps)).astype(dtype)


def _apply_rotary_interleaved(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """(reference apply_rotary_emb, denoiser.py:201-216): halves-rotation
    with full-width cos/sin; x is heads-packed (B, S, H, D), cos/sin (S, D)."""
    x_real, x_imag = jnp.split(
        x.reshape(*x.shape[:-1], 2, -1), 2, axis=-2
    )
    x_real = x_real.squeeze(-2)
    x_imag = x_imag.squeeze(-2)
    x_rotated = jnp.concatenate([-x_imag, x_real], axis=-1)
    return (
        x.astype(jnp.float32) * cos[None, :, None]
        + x_rotated.astype(jnp.float32) * sin[None, :, None]
    ).astype(x.dtype)


class SelfAttention(ModuleDict):
    def __init__(self, hidden_dim: int, num_heads: int, bias: bool = True,
                 attention_backend: str = "xla"):
        self.num_heads = num_heads
        self.head_dim = hidden_dim // num_heads
        self.backend = attention_backend
        super().__init__(
            {
                "to_q": Linear(hidden_dim, hidden_dim, bias=bias),
                "to_k": Linear(hidden_dim, hidden_dim, bias=bias),
                "to_v": Linear(hidden_dim, hidden_dim, bias=bias),
                "to_out": ModuleDict({"0": Linear(hidden_dim, hidden_dim, bias=bias)}),
            }
        )

    def __call__(self, params, hidden_states, encoder_hidden_states, rope_freqs):
        text_len = encoder_hidden_states.shape[1]
        x = jnp.concatenate([encoder_hidden_states, hidden_states], axis=1)
        b, s, _ = x.shape
        h, d = self.num_heads, self.head_dim

        def heads(t):
            # heads-packed (B, S, H, D): the (B, H, S, D) transposes never
            # exist — qk-norm/RoPE run per-head in place and attention goes
            # straight through the BSHD flash kernel.
            return t.reshape(b, s, h, d)

        q = _qk_norm(heads(self["to_q"](params["to_q"], x)))
        k = _qk_norm(heads(self["to_k"](params["to_k"], x)))
        v = heads(self["to_v"](params["to_v"], x))

        if rope_freqs is not None:
            cos, sin = rope_freqs
            q = jnp.concatenate(
                [q[:, :text_len], _apply_rotary_interleaved(q[:, text_len:], cos, sin)],
                axis=1,
            )
            k = jnp.concatenate(
                [k[:, :text_len], _apply_rotary_interleaved(k[:, text_len:], cos, sin)],
                axis=1,
            )

        attn = attention_heads_packed(
            q.reshape(b, s, h * d), k.reshape(b, s, h * d),
            v.reshape(b, s, h * d), h, backend=self.backend,
        )
        attn = self["to_out"]["0"](params["to_out"]["0"], attn)
        return attn[:, text_len:], attn[:, :text_len]


class FeedForward(ModuleDict):
    def __init__(self, hidden_dim: int, mlp_scale: float = 4.0, bias: bool = True):
        inner = int(hidden_dim * mlp_scale)
        super().__init__(
            {
                "net": ModuleDict(
                    {
                        "0": ModuleDict({"proj": Linear(hidden_dim, inner, bias=bias)}),
                        "2": Linear(inner, hidden_dim, bias=bias),
                    }
                )
            }
        )

    def __call__(self, params, x):
        h = self["net"]["0"]["proj"](params["net"]["0"]["proj"], x)
        h = jax.nn.gelu(h, approximate=True)
        # saved under remat_layer's activation policy (down-proj input)
        return self["net"]["2"](params["net"]["2"], save_name(h, "ff_inner"))


class TransformerBlock(ModuleDict):
    def __init__(self, hidden_dim: int, num_attention_heads: int,
                 time_embed_dim: int, attention_backend: str = "xla"):
        self.norm = LayerNorm(hidden_dim, eps=1e-5, elementwise_affine=False)
        super().__init__(
            {
                "norm1": ModuleDict({"linear": Linear(time_embed_dim, 12 * hidden_dim)}),
                "attn1": SelfAttention(hidden_dim, num_attention_heads, True, attention_backend),
                "ff": FeedForward(hidden_dim),
            }
        )

    def __call__(self, params, hidden_states, encoder_hidden_states, time_embed, rope_freqs):
        emb = self["norm1"]["linear"](params["norm1"]["linear"], time_embed)
        (shift_msa, c_shift_msa, scale_msa, c_scale_msa, gate_msa, c_gate_msa,
         shift_mlp, c_shift_mlp, scale_mlp, c_scale_mlp, gate_mlp, c_gate_mlp) = jnp.split(
            emb, 12, axis=1
        )

        norm_h = self.norm({}, hidden_states) * (1 + scale_msa[:, None]) + shift_msa[:, None]
        norm_c = self.norm({}, encoder_hidden_states) * (
            1 + c_scale_msa[:, None]
        ) + c_shift_msa[:, None]

        attn_h, attn_c = self["attn1"](params["attn1"], norm_h, norm_c, rope_freqs)
        hidden_states = save_name(
            hidden_states + attn_h * gate_msa[:, None], "res_stream"
        )
        encoder_hidden_states = save_name(
            encoder_hidden_states + attn_c * c_gate_msa[:, None], "res_stream"
        )

        norm_h = self.norm({}, hidden_states) * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
        norm_c = self.norm({}, encoder_hidden_states) * (
            1 + c_scale_mlp[:, None]
        ) + c_shift_mlp[:, None]
        hidden_states = hidden_states + self["ff"](params["ff"], norm_h) * gate_mlp[:, None]
        encoder_hidden_states = (
            encoder_hidden_states + self["ff"](params["ff"], norm_c) * c_gate_mlp[:, None]
        )
        return hidden_states, encoder_hidden_states


def _rope_freqs(height: int, width: int, patch_size: int, head_dim: int,
                rope_axes_dim: list[int], theta: float = 10000.0):
    """2-axis interleaved table with grid resampling (reference RoPE,
    denoiser.py:426-484). Static numpy."""
    hp, wp = height // patch_size, width // patch_size
    dim_h = dim_w = head_dim // 2
    h_inv = 1.0 / (theta ** (np.arange(0, dim_h, 2, dtype=np.float32)[: dim_h // 2] / dim_h))
    w_inv = 1.0 / (theta ** (np.arange(0, dim_w, 2, dtype=np.float32)[: dim_w // 2] / dim_w))
    freqs_h_table = np.outer(np.arange(rope_axes_dim[0]), h_inv).astype(np.float32)
    freqs_w_table = np.outer(np.arange(rope_axes_dim[1]), w_inv).astype(np.float32)
    inner_h = np.arange(hp) * rope_axes_dim[0] // hp
    inner_w = np.arange(wp) * rope_axes_dim[1] // wp
    fh = freqs_h_table[inner_h][:, None].repeat(wp, axis=1)
    fw = freqs_w_table[inner_w][None, :].repeat(hp, axis=0)
    freqs = np.concatenate([fh, fw], axis=-1)
    freqs = np.concatenate([freqs, freqs], axis=-1).reshape(hp * wp, -1)
    return jnp.asarray(np.cos(freqs)), jnp.asarray(np.sin(freqs))


class FinalAdaLayerNorm(ModuleDict):
    def __init__(self, hidden_dim: int, condition_dim: int):
        self.norm = LayerNorm(hidden_dim, eps=1e-5, elementwise_affine=False)
        super().__init__({"linear": Linear(condition_dim, 2 * hidden_dim)})

    def __call__(self, params, hidden_states, condition):
        cond = jax.nn.silu(condition).astype(hidden_states.dtype)
        emb = self["linear"](params["linear"], cond)
        scale, shift = jnp.split(emb, 2, axis=-1)
        return self.norm({}, hidden_states) * (1 + scale)[:, None] + shift[:, None]


class CogView4DiT(Module):
    def __init__(self, config: DenoiserConfig):
        self.config = config
        self.inner_dim = config.num_attention_heads * config.attention_head_dim
        self.patch_size = config.patch_size
        self.out_channels = config.out_channels
        self.pooled_projection_dim = 3 * 2 * config.condition_dim
        self.gradient_checkpointing = False
        self._pipeline = None  # (mesh, num_microbatches, axis) — set_pipeline

        self.patch_proj = Linear(config.in_channels * config.patch_size**2, self.inner_dim)
        self.text_proj = Linear(config.text_embed_dim, self.inner_dim)
        self.time_condition_embed = GlobalConditionEmbedding(
            embedding_dim=config.time_embed_dim,
            condition_dim=config.condition_dim,
            pooled_projection_dim=self.pooled_projection_dim,
            timesteps_dim=self.inner_dim,
        )
        self.transformer_blocks = [
            TransformerBlock(self.inner_dim, config.num_attention_heads,
                             config.time_embed_dim, config.attention_backend)
            for _ in range(config.num_layers)
        ]
        self.norm_out = FinalAdaLayerNorm(self.inner_dim, config.time_embed_dim)
        self.proj_out = Linear(self.inner_dim, config.patch_size**2 * config.out_channels)

    def init(self, key, dtype=jnp.float32):
        keys = split_keys(key, ["patch", "text", "time", "blocks", "norm_out", "proj_out"])
        bkeys = jax.random.split(keys["blocks"], len(self.transformer_blocks))
        return {
            "patch_embed": {
                "proj": self.patch_proj.init(keys["patch"], dtype),
                "text_proj": self.text_proj.init(keys["text"], dtype),
            },
            "time_condition_embed": self.time_condition_embed.init(keys["time"], dtype),
            "transformer_blocks": {
                str(i): blk.init(k, dtype)
                for i, (blk, k) in enumerate(zip(self.transformer_blocks, bkeys))
            },
            "norm_out": self.norm_out.init(keys["norm_out"], dtype),
            "proj_out": self.proj_out.init(keys["proj_out"], dtype),
        }

    def set_gradient_checkpointing(self, enabled: bool):
        self.gradient_checkpointing = enabled

    def set_pipeline(self, mesh, num_microbatches: int, axis: str = "pipe"):
        """Opt-in GPipe pipelining of the uniform transformer stack over
        ``mesh[axis]`` (parallel/pipeline.py). ``set_pipeline(None, 1)``
        disables."""
        if mesh is not None:
            p = mesh.shape[axis]
            assert len(self.transformer_blocks) % p == 0, (
                len(self.transformer_blocks), p,
            )
        self._pipeline = (mesh, num_microbatches, axis) if mesh is not None else None

    def _prepare_tokens(
        self, params, latent, encoder_hidden_states, timestep,
        original_size, target_size, crop_coords,
    ):
        """Embeddings, RoPE tables and the global adaLN condition. Shared
        by ``__call__`` and ``deepcache_forward``."""
        b, height, width, _ = latent.shape
        p = self.patch_size

        patches = patchify(latent, p)
        hidden_states = self.patch_proj(params["patch_embed"]["proj"], patches)
        encoder_hidden_states = self.text_proj(
            params["patch_embed"]["text_proj"], encoder_hidden_states
        )

        rope_freqs = _rope_freqs(
            height, width, p, self.config.attention_head_dim, self.config.rope_axes_dim
        )

        global_cond = self.time_condition_embed(
            params["time_condition_embed"], timestep, original_size, target_size,
            crop_coords, hidden_states.dtype,
        )
        return hidden_states, encoder_hidden_states, rope_freqs, global_cond, height, width

    def _run_blocks_range(self, params, hidden_states, encoder_hidden_states,
                          global_cond, rope_freqs, start: int = 0, end=None):
        """Transformer blocks [start, end) as a plain stack, checkpointed
        in groups of nn.core.remat_group() layers."""
        end = len(self.transformer_blocks) if end is None else end
        return run_remat_stack(
            lambda block, pp, hc: block(pp, hc[0], hc[1], global_cond, rope_freqs),
            self.transformer_blocks[start:end],
            [params["transformer_blocks"][str(i)] for i in range(start, end)],
            (hidden_states, encoder_hidden_states),
            self.gradient_checkpointing,
        )

    def _finish(self, params, hidden_states, global_cond, height: int, width: int):
        p = self.patch_size
        hidden_states = self.norm_out(params["norm_out"], hidden_states, global_cond)
        hidden_states = self.proj_out(params["proj_out"], hidden_states)
        return unpatchify_cmajor(
            hidden_states, height // p, width // p, p, self.out_channels
        )

    def __call__(
        self,
        params,
        latent: jax.Array,  # (B, H, W, C) NHWC
        encoder_hidden_states: jax.Array,
        timestep: jax.Array,
        original_size: jax.Array,
        target_size: jax.Array,
        crop_coords: jax.Array,
    ) -> jax.Array:
        (hidden_states, encoder_hidden_states, rope_freqs, global_cond,
         height, width) = self._prepare_tokens(
            params, latent, encoder_hidden_states, timestep,
            original_size, target_size, crop_coords,
        )

        if self._pipeline is not None:
            from ...parallel.pipeline import run_pipelined_stack

            mesh, num_mb, axis = self._pipeline
            block0 = self.transformer_blocks[0]

            def block_fn(lp, carry, static):
                h, c = block0(lp, carry["h"], carry["c"], carry["g"], static)
                return {"h": h, "c": c, "g": carry["g"]}

            out = run_pipelined_stack(
                block_fn,
                [params["transformer_blocks"][str(i)]
                 for i in range(len(self.transformer_blocks))],
                {"h": hidden_states, "c": encoder_hidden_states, "g": global_cond},
                rope_freqs,
                mesh, num_mb, axis=axis,
                wrap=remat_layer if self.gradient_checkpointing else None,
            )
            hidden_states, encoder_hidden_states = out["h"], out["c"]
        else:
            hidden_states, encoder_hidden_states = self._run_blocks_range(
                params, hidden_states, encoder_hidden_states, global_cond,
                rope_freqs,
            )

        return self._finish(params, hidden_states, global_cond, height, width)

    def deepcache_forward(
        self,
        params,
        latent: jax.Array,
        encoder_hidden_states: jax.Array,
        timestep: jax.Array,
        original_size: jax.Array,
        target_size: jax.Array,
        crop_coords: jax.Array,
        cached_delta: Optional[jax.Array] = None,
        refresh: bool = True,
        cache_depth: Optional[int] = None,
    ):
        """DeepCache-style step caching (same Delta-DiT scheme as the
        Lumina2/AuraFlow variants; beyond the reference, which has no step
        caching). The block stack is residual, so a full (``refresh=True``)
        step records ``delta = h_N - h_k`` of the deep suffix [k, N); a
        cached step runs only the shallow prefix [0, k) fresh and
        approximates ``h_N = h_k + delta``. Only the image stream's delta
        is cached — the final layer never reads the text stream. Returns
        ``(output, delta)``.
        """
        assert self._pipeline is None, "DeepCache is an inference-only path"
        n = len(self.transformer_blocks)
        k = cache_depth if cache_depth is not None else max(1, n // 4)
        assert 0 < k < n, (k, n)

        (hidden_states, encoder_hidden_states, rope_freqs, global_cond,
         height, width) = self._prepare_tokens(
            params, latent, encoder_hidden_states, timestep,
            original_size, target_size, crop_coords,
        )
        hidden_states, encoder_hidden_states = self._run_blocks_range(
            params, hidden_states, encoder_hidden_states, global_cond,
            rope_freqs, 0, k,
        )
        if refresh:
            shallow = hidden_states
            hidden_states, _ = self._run_blocks_range(
                params, hidden_states, encoder_hidden_states, global_cond,
                rope_freqs, k, n,
            )
            delta = hidden_states - shallow
        else:
            assert cached_delta is not None
            hidden_states = hidden_states + cached_delta.astype(hidden_states.dtype)
            delta = cached_delta
        out = self._finish(params, hidden_states, global_cond, height, width)
        return out, delta


class Denoiser(CogView4DiT):
    def set_gradient_checkpointing(self, gradient_checkpointing: bool):
        self.gradient_checkpointing = gradient_checkpointing
