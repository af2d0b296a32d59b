"""Wan 2.2 video DiT denoiser — TPU-native functional implementation.

Behavioral spec: /root/reference/src/models/wan/denoiser.py (846 LoC,
torch + flash-attn varlen). From-scratch JAX design decisions:

- Latents are dense NFHWC ``(B, F, H, W, C)`` with a uniform grid per
  batch (the reference carries ragged nested tensors padded to
  ``seq_len`` and masks keys with varlen flash attention,
  denoiser.py:618-659; with a uniform grid the padded rows are inert, so
  the dense no-padding forward produces identical values on every valid
  token — XLA gets static shapes and the MXU gets one big batch).
- The Conv3d patch embedding (kernel == stride, denoiser.py:518-523) is
  lowered to reshape + one matmul: stride==kernel convs are exactly patch
  extraction, and a single ``(B*L, C*pf*ph*pw) @ (dim, ...)^T`` matmul is
  the MXU-optimal form. The stored weight keeps the torch OIDHW layout so
  checkpoints round-trip byte-for-byte.
- 3-axis RoPE (denoiser.py:49-104) uses host-precomputed float64 cos/sin
  tables (the reference computes complex64 products in float64); the
  per-grid table is a static constant folded into the jaxpr, and rotation
  runs in fp32.
- Timesteps may be scalar-per-sample ``(B,)`` or per-token ``(B, L)``
  (Wan 2.2 ti2v trains with per-token timesteps). In the scalar case the
  time MLP runs once per sample and broadcasts — mathematically identical
  to the reference's expand-then-embed (denoiser.py:662-676), seq_len×
  cheaper.
- Modulation/norm/residual arithmetic runs in fp32 islands exactly where
  the reference pins ``torch.autocast(dtype=float32)`` (denoiser.py:394,
  410, 426, 466); the residual stream is carried in fp32 and matmul
  inputs are cast to the parameter dtype so bf16 rides the MXU.
- Context is zero-padded to ``text_len`` and embedded; cross-attention
  attends to ALL ``text_len`` keys — the reference passes
  ``context_lens=None`` (denoiser.py:686-711), so padding rows are real
  (bias-driven) keys, reproduced here for parity.

State-dict keys flatten to the reference torch layout
(patch_embedding.*, text_embedding.{0,2}.*, time_embedding.{0,2}.*,
time_projection.1.*, blocks.N.{self_attn,cross_attn}.{q,k,v,o,norm_q,
norm_k}.*, blocks.N.{norm3,ffn.0,ffn.2,modulation}, head.{head,modulation}).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...nn import LayerNorm, Linear, Module, ModuleDict, RMSNorm, split_keys
from ...nn.core import remat_layer, run_remat_stack, save_name
from ...ops.attention import attention_heads_packed
from .config import DenoiserConfig


def sinusoidal_embedding_1d(dim: int, position: jax.Array) -> jax.Array:
    """[cos | sin] sinusoid table (reference denoiser.py:34-46; cos first)."""
    half = dim // 2
    pos = position.astype(jnp.float32)
    freqs = jnp.power(10000.0, -jnp.arange(half, dtype=jnp.float32) / half)
    sinusoid = pos[..., None] * freqs
    return jnp.concatenate([jnp.cos(sinusoid), jnp.sin(sinusoid)], axis=-1)


def _rope_tables(max_seq_len: int, dim: int, theta: float = 10000.0):
    """cos/sin tables for one RoPE axis, float64 on host
    (reference rope_params, denoiser.py:50-62)."""
    freqs = np.outer(
        np.arange(max_seq_len, dtype=np.float64),
        1.0 / np.power(theta, np.arange(0, dim, 2, dtype=np.float64) / dim),
    )
    return np.cos(freqs), np.sin(freqs)


def _linear_fp32(params, x: jax.Array) -> jax.Array:
    """Small MLP linears inside the reference's fp32 autocast islands."""
    y = x.astype(jnp.float32) @ params["weight"].astype(jnp.float32).T
    if "bias" in params:
        y = y + params["bias"].astype(jnp.float32)
    return y


class WanAttention(ModuleDict):
    """q/k/v/o with full-dim fp32 RMSNorm on q and k BEFORE the head split
    (reference SelfAttention, denoiser.py:222-288 — note norm over ``dim``,
    not ``head_dim``)."""

    def __init__(self, dim: int, num_heads: int, eps: float = 1e-6):
        self.dim = dim
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        super().__init__(
            {
                "q": Linear(dim, dim),
                "k": Linear(dim, dim),
                "v": Linear(dim, dim),
                "o": Linear(dim, dim),
                "norm_q": RMSNorm(dim, eps=eps),
                "norm_k": RMSNorm(dim, eps=eps),
            }
        )

    def __call__(self, params, x, context=None, rope=None):
        context = x if context is None else context
        wdtype = params["q"]["weight"].dtype
        x = x.astype(wdtype)
        context = context.astype(wdtype)

        # heads-packed: RoPE runs on a (B, S, H, d) VIEW (minor-dim
        # reshape) and attention goes straight from the packed (B, S, H*d)
        # projections through the BSHD flash kernel on TPU — the
        # (B, H, S, d) transposes never exist
        q = self["norm_q"](params["norm_q"], self["q"](params["q"], x))
        k = self["norm_k"](params["norm_k"], self["k"](params["k"], context))
        v = self["v"](params["v"], context)

        if rope is not None:
            cos, sin = rope  # (S, c) fp32
            q = _apply_rope(q, self.num_heads, cos, sin).astype(wdtype)
            k = _apply_rope(k, self.num_heads, cos, sin).astype(wdtype)

        out = attention_heads_packed(
            q, k, v, self.num_heads,
            scale=1.0 / math.sqrt(self.head_dim), backend="flash",
        )
        return self["o"](params["o"], out)


def _apply_rope(x: jax.Array, num_heads: int, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Interleaved-pair rotation in fp32 (reference rope_apply,
    denoiser.py:65-104, complex multiply on (even, odd) pairs) on the
    heads-packed (B, S, H*d) layout."""
    b, s, hd = x.shape
    xf = x.astype(jnp.float32).reshape(b, s, num_heads, hd // num_heads // 2, 2)
    even, odd = xf[..., 0], xf[..., 1]
    cos, sin = cos[:, None], sin[:, None]  # (S, 1, c) over (B, S, H, c)
    out_even = even * cos - odd * sin
    out_odd = even * sin + odd * cos
    return jnp.stack([out_even, out_odd], axis=-1).reshape(b, s, hd)


class WanBlock(ModuleDict):
    """adaLN-zero DiT block (reference AdaLayerNormZero, denoiser.py:323-429):
    learned per-layer modulation table (1, 6, dim) ADDED to the per-token
    timestep embed, fp32 modulation/residual arithmetic."""

    def __init__(self, dim: int, ffn_dim: int, num_heads: int, eps: float = 1e-6):
        self.dim = dim
        super().__init__(
            {
                "norm1": LayerNorm(dim, eps=eps, elementwise_affine=False),
                "self_attn": WanAttention(dim, num_heads, eps),
                "norm3": LayerNorm(dim, eps=eps, elementwise_affine=True),
                "cross_attn": WanAttention(dim, num_heads, eps),
                "norm2": LayerNorm(dim, eps=eps, elementwise_affine=False),
                "ffn": ModuleDict({"0": Linear(dim, ffn_dim), "2": Linear(ffn_dim, dim)}),
            }
        )

    def init(self, key, dtype=jnp.float32):
        keys = split_keys(key, list(self.children) + ["modulation"])
        params = {}
        for n, m in self.children.items():
            p = m.init(keys[n], dtype)
            if p:
                params[n] = p
        params["modulation"] = (
            jax.random.normal(keys["modulation"], (1, 6, self.dim), dtype)
            / self.dim**0.5
        )
        return params

    def __call__(self, params, x, timestep_embed, rope, context):
        # x: fp32 residual stream (B, L, D); timestep_embed (B, L|1, 6, D) fp32
        mod = params["modulation"].astype(jnp.float32) + timestep_embed
        shift_sa, scale_sa, gate_sa, shift_mlp, scale_mlp, gate_mlp = [
            m[:, :, 0] for m in jnp.split(mod, 6, axis=2)
        ]

        h = self["norm1"]({}, x) * (1 + scale_sa) + shift_sa
        attn = self["self_attn"](params["self_attn"], h, rope=rope)
        x = save_name(x + attn.astype(jnp.float32) * gate_sa, "res_stream")

        h = self["norm3"](params["norm3"], x)
        x = x + self["cross_attn"](params["cross_attn"], h, context=context).astype(
            jnp.float32
        )
        x = save_name(x, "res_stream")

        h = self["norm2"]({}, x) * (1 + scale_mlp) + shift_mlp
        wdtype = params["ffn"]["0"]["weight"].dtype
        h = self["ffn"]["0"](params["ffn"]["0"], h.astype(wdtype))
        h = jax.nn.gelu(h, approximate=True)
        # gelu output saved under remat_layer's activation policy
        h = self["ffn"]["2"](params["ffn"]["2"], save_name(h, "ff_inner"))
        return x + h.astype(jnp.float32) * gate_mlp


class FinalLayer(ModuleDict):
    """Final adaLN + projection head (reference FinalAdaLayerNorm,
    denoiser.py:432-475); modulation table (1, 2, dim)."""

    def __init__(self, dim: int, out_dim: int, patch_size, eps: float = 1e-6):
        self.dim = dim
        super().__init__(
            {
                "norm": LayerNorm(dim, eps=eps, elementwise_affine=False),
                "head": Linear(dim, math.prod(patch_size) * out_dim),
            }
        )

    def init(self, key, dtype=jnp.float32):
        keys = split_keys(key, ["head", "modulation"])
        params = {
            "head": self["head"].init(keys["head"], dtype),
            # xavier-zero head (reference init_weights, denoiser.py:817)
            "modulation": jax.random.normal(keys["modulation"], (1, 2, self.dim), dtype)
            / self.dim**0.5,
        }
        params["head"]["weight"] = jnp.zeros_like(params["head"]["weight"])
        return params

    def __call__(self, params, x, timestep_element):
        # timestep_element: (B, L|1, D) fp32
        mod = params["modulation"].astype(jnp.float32) + timestep_element[:, :, None]
        shift, scale = mod[:, :, 0], mod[:, :, 1]
        h = self["norm"]({}, x) * (1 + scale) + shift
        return _linear_fp32(params["head"], h)


class DiT(Module):
    """Wan 2.2 DiT (reference denoiser.py:478-817)."""

    def __init__(
        self,
        model_type: str = "t2v",
        patch_size: tuple[int, int, int] = (1, 2, 2),
        text_len: int = 512,
        in_dim: int = 16,
        dim: int = 2048,
        ffn_dim: int = 8192,
        freq_dim: int = 256,
        text_dim: int = 4096,
        out_dim: int = 16,
        num_heads: int = 16,
        num_layers: int = 32,
        eps: float = 1e-6,
        gradient_checkpointing: bool = False,
    ):
        assert model_type in ("t2v", "i2v", "ti2v")
        assert dim % num_heads == 0 and (dim // num_heads) % 2 == 0
        self.model_type = model_type
        self.patch_size = patch_size
        self.text_len = text_len
        self.in_dim = in_dim
        self.dim = dim
        self.freq_dim = freq_dim
        self.out_dim = out_dim
        self.num_heads = num_heads
        self.num_layers = num_layers
        self.gradient_checkpointing = gradient_checkpointing
        self._pipeline = None  # (mesh, num_microbatches, axis) — set_pipeline

        self.text_embedding = ModuleDict(
            {"0": Linear(text_dim, dim), "2": Linear(dim, dim)}
        )
        self.time_embedding = ModuleDict(
            {"0": Linear(freq_dim, dim), "2": Linear(dim, dim)}
        )
        self.time_projection = ModuleDict({"1": Linear(dim, dim * 6)})
        self.blocks = [WanBlock(dim, ffn_dim, num_heads, eps) for _ in range(num_layers)]
        self.head = FinalLayer(dim, out_dim, patch_size, eps)

        # RoPE tables: [frames | height | width] axes with head_dim split
        # d - 4*(d//6), 2*(d//6), 2*(d//6) (reference denoiser.py:560-569)
        d = dim // num_heads
        self._rope_f = _rope_tables(1024, d - 4 * (d // 6))
        self._rope_h = _rope_tables(1024, 2 * (d // 6))
        self._rope_w = _rope_tables(1024, 2 * (d // 6))

    def init(self, key, dtype=jnp.float32):
        names = ["patch_embedding", "text_embedding", "time_embedding",
                 "time_projection", "head"] + [f"blocks.{i}" for i in range(self.num_layers)]
        keys = split_keys(key, names)
        pf, ph, pw = self.patch_size
        fan_in = self.in_dim * pf * ph * pw
        # xavier-uniform on the flattened kernel (reference denoiser.py:808)
        bound = math.sqrt(6.0 / (fan_in + self.dim))
        wkey, bkey = jax.random.split(keys["patch_embedding"])
        params = {
            "patch_embedding": {
                "weight": jax.random.uniform(
                    wkey, (self.dim, self.in_dim, pf, ph, pw), dtype, -bound, bound
                ),
                "bias": jnp.zeros((self.dim,), dtype),
            },
            "text_embedding": self.text_embedding.init(keys["text_embedding"], dtype),
            "time_embedding": self.time_embedding.init(keys["time_embedding"], dtype),
            "time_projection": self.time_projection.init(keys["time_projection"], dtype),
            "head": self.head.init(keys["head"], dtype),
            "blocks": {
                str(i): blk.init(keys[f"blocks.{i}"], dtype)
                for i, blk in enumerate(self.blocks)
            },
        }
        # normal(std=0.02) text/time MLP weights (reference denoiser.py:809-814)
        for name in ("text_embedding", "time_embedding"):
            for sub in ("0", "2"):
                w = params[name][sub]["weight"]
                params[name][sub]["weight"] = 0.02 * jax.random.normal(
                    jax.random.fold_in(keys[name], int(sub)), w.shape, dtype
                )
        return params

    # -- patching ----------------------------------------------------------

    def _patchify(self, params, latents: jax.Array) -> jax.Array:
        """Conv3d(kernel=stride=patch) as reshape+matmul. latents NFHWC."""
        b, frames, height, width, c = latents.shape
        pf, ph, pw = self.patch_size
        f, h, w = frames // pf, height // ph, width // pw
        x = latents.reshape(b, f, pf, h, ph, w, pw, c)
        # flatten patch features in the torch Conv3d order (C, pf, ph, pw)
        x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6).reshape(b, f * h * w, c * pf * ph * pw)
        weight = params["weight"]
        wmat = weight.reshape(weight.shape[0], -1).astype(x.dtype)
        return x @ wmat.T + params["bias"].astype(x.dtype)

    def _unpatchify(self, patches: jax.Array, grid) -> jax.Array:
        """(B, L, prod(patch)*C_out) -> NFHWC (reference denoiser.py:735-793)."""
        b = patches.shape[0]
        f, h, w = grid
        pf, ph, pw = self.patch_size
        x = patches.reshape(b, f, h, w, pf, ph, pw, self.out_dim)
        x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
        return x.reshape(b, f * pf, h * ph, w * pw, self.out_dim)

    def set_pipeline(self, mesh, num_microbatches: int, axis: str = "pipe"):
        """Opt-in GPipe pipelining of the uniform block stack over
        ``mesh[axis]`` (parallel/pipeline.py). ``set_pipeline(None, 1)``
        disables."""
        if mesh is not None:
            p = mesh.shape[axis]
            assert len(self.blocks) % p == 0, (len(self.blocks), p)
        self._pipeline = (mesh, num_microbatches, axis) if mesh is not None else None

    def _rope_for_grid(self, grid) -> tuple[jax.Array, jax.Array]:
        """Static per-grid cos/sin (seq, c) — concat of the three axis tables
        expanded over (f, h, w) (reference rope_apply, denoiser.py:88-96)."""
        f, h, w = grid
        parts_cos, parts_sin = [], []
        for (cos_t, sin_t), reps, axis_len in (
            (self._rope_f, (1, h * w), f),
            (self._rope_h, (f, w), h),
            (self._rope_w, (f * h, 1), w),
        ):
            cos = cos_t[:axis_len]
            sin = sin_t[:axis_len]
            if reps == (1, h * w):
                cos = np.repeat(cos, h * w, axis=0)
                sin = np.repeat(sin, h * w, axis=0)
            elif reps == (f, w):
                cos = np.tile(np.repeat(cos, w, axis=0), (f, 1))
                sin = np.tile(np.repeat(sin, w, axis=0), (f, 1))
            else:
                cos = np.tile(cos, (f * h, 1))
                sin = np.tile(sin, (f * h, 1))
            parts_cos.append(cos)
            parts_sin.append(sin)
        cos = jnp.asarray(np.concatenate(parts_cos, axis=1), jnp.float32)
        sin = jnp.asarray(np.concatenate(parts_sin, axis=1), jnp.float32)
        return cos, sin

    # -- forward -----------------------------------------------------------

    def _prepare_tokens(
        self,
        params,
        latents: jax.Array,
        timesteps: jax.Array,
        context: jax.Array,
    ):
        """Patchify, RoPE, fp32 time embeddings, context embedding. Shared
        by ``__call__`` and ``deepcache_forward``."""
        b, frames, height, width, _ = latents.shape
        pf, ph, pw = self.patch_size
        grid = (frames // pf, height // ph, width // pw)

        x = self._patchify(params["patch_embedding"], latents)
        rope = self._rope_for_grid(grid)

        # time embeddings, fp32 island (reference denoiser.py:661-683);
        # scalar timesteps embed once per sample and broadcast over tokens
        t = timesteps.astype(jnp.float32)
        if t.ndim == 1:
            t = t[:, None]  # (B, 1)
        ts_sin = sinusoidal_embedding_1d(self.freq_dim, t)
        h0 = _linear_fp32(params["time_embedding"]["0"], ts_sin)
        timestep_element = _linear_fp32(
            params["time_embedding"]["2"], jax.nn.silu(h0)
        )  # (B, L|1, dim)
        timestep_embed = _linear_fp32(
            params["time_projection"]["1"], jax.nn.silu(timestep_element)
        ).reshape(*timestep_element.shape[:2], 6, self.dim)

        # context: zero-pad to text_len, then embed (reference :686-702 —
        # padding rows become real bias-driven keys; no cross-attn mask)
        if context.shape[1] < self.text_len:
            context = jnp.pad(
                context, ((0, 0), (0, self.text_len - context.shape[1]), (0, 0))
            )
        cdtype = params["text_embedding"]["0"]["weight"].dtype
        ctx = self.text_embedding["0"](
            params["text_embedding"]["0"], context.astype(cdtype)
        )
        ctx = self.text_embedding["2"](
            params["text_embedding"]["2"], jax.nn.gelu(ctx, approximate=True)
        )
        return x.astype(jnp.float32), timestep_embed, timestep_element, ctx, rope, grid

    def _run_blocks_range(self, params, x, timestep_embed, rope, ctx,
                          start: int = 0, end=None):
        """Blocks [start, end) as a plain stack, checkpointed in groups
        of nn.core.remat_group() layers."""
        end = len(self.blocks) if end is None else end
        return run_remat_stack(
            lambda block, pp, xx: block(pp, xx, timestep_embed, rope, ctx),
            self.blocks[start:end],
            [params["blocks"][str(i)] for i in range(start, end)],
            x,
            self.gradient_checkpointing,
        )

    def __call__(
        self,
        params,
        latents: jax.Array,  # (B, F, H, W, C_in) NFHWC
        timesteps: jax.Array,  # (B,) or (B, L)
        context: jax.Array,  # (B, Lc, text_dim), zero-padded anywhere <= text_len
    ) -> jax.Array:
        x, timestep_embed, timestep_element, ctx, rope, grid = (
            self._prepare_tokens(params, latents, timesteps, context)
        )
        if self._pipeline is not None:
            from ...parallel.pipeline import run_pipelined_stack

            mesh, num_mb, axis = self._pipeline
            blk0 = self.blocks[0]

            def block_fn(lp, carry, static):
                return {
                    "x": blk0(lp, carry["x"], carry["t"], static, carry["ctx"]),
                    "t": carry["t"], "ctx": carry["ctx"],
                }

            x = run_pipelined_stack(
                block_fn,
                [params["blocks"][str(i)] for i in range(len(self.blocks))],
                {"x": x, "t": timestep_embed, "ctx": ctx},
                rope,
                mesh, num_mb, axis=axis,
                wrap=remat_layer if self.gradient_checkpointing else None,
            )["x"]
        else:
            x = self._run_blocks_range(params, x, timestep_embed, rope, ctx)

        out = self.head(params["head"], x, timestep_element)
        return self._unpatchify(out, grid)

    def deepcache_forward(
        self,
        params,
        latents: jax.Array,
        timesteps: jax.Array,
        context: jax.Array,
        cached_delta: Optional[jax.Array] = None,
        refresh: bool = True,
        cache_depth: Optional[int] = None,
    ):
        """DeepCache-style step caching (same Delta-DiT scheme as the image
        DiT families; beyond the reference, which has no step caching). The
        uniform block stack is residual: a full (``refresh=True``) step
        records ``delta = x_N - x_k`` of the deep suffix [k, N); a cached
        step runs only the shallow prefix fresh and adds the cached delta.
        Returns ``(output, delta)``."""
        assert self._pipeline is None, "DeepCache is an inference-only path"
        n = len(self.blocks)
        k = cache_depth if cache_depth is not None else max(1, n // 4)
        assert 0 < k < n, (k, n)

        x, timestep_embed, timestep_element, ctx, rope, grid = (
            self._prepare_tokens(params, latents, timesteps, context)
        )
        x = self._run_blocks_range(params, x, timestep_embed, rope, ctx, 0, k)
        if refresh:
            shallow = x
            x = self._run_blocks_range(params, x, timestep_embed, rope, ctx, k, n)
            delta = x - shallow
        else:
            assert cached_delta is not None
            x = x + cached_delta.astype(x.dtype)
            delta = cached_delta
        out = self.head(params["head"], x, timestep_element)
        return self._unpatchify(out, grid), delta


class Denoiser(DiT):
    """Config-driven wrapper (reference denoiser.py:820-846)."""

    def __init__(self, config: DenoiserConfig):
        super().__init__(
            model_type=config.type,
            patch_size=tuple(config.patch_size),
            text_len=config.text_length,
            in_dim=config.in_channels,
            dim=config.hidden_dim,
            ffn_dim=config.ffn_dim,
            freq_dim=config.freq_dim,
            text_dim=config.text_dim,
            out_dim=config.out_channels,
            num_heads=config.num_heads,
            num_layers=config.num_layers,
            eps=config.norm_eps,
        )
        self.config = config

    def set_gradient_checkpointing(self, value: bool) -> None:
        self.gradient_checkpointing = value
