"""AuraFlow MMDiT denoiser — TPU-native functional implementation.

Behavioral spec: /root/reference/src/models/auraflow/denoiser.py (902 LoC,
torch). From-scratch JAX design:

- Latents are NHWC; patchify/unpatchify use the shared modules/patch.py
  helpers whose feature ordering matches the reference exactly.
- Attention runs through the shared dispatch (Pallas flash kernel on TPU;
  joint seq = 8 register + 256 text + (H/2)(W/2) image tokens).
- adaLN ("mod*") projections, final_linear and cond_seq_linear are
  zero-initialized like the reference (denoiser.py:656-668).
- Learned positional encoding with center-crop index selection
  (pe_selection_index_based_on_dim, reference denoiser.py:678-700) — all
  index math is static Python (no traced gather).
- Optional 3-axis RoPE / shortcut embedder / guidance embedder. Reference
  quirk preserved: the guidance embedder is fed the *timestep*, not the
  guidance scale (denoiser.py:782-791).

Param-tree keys flatten to the reference torch state-dict layout
(t_embedder.mlp.0.*, double_layers.N.attn.w1q.*, modC.1.*, ...).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...modules.patch import patchify, unpatchify
from ...modules.positional_encoding.rope import RoPEFrequency, apply_rope_qk
from ...nn import LayerNorm, Linear, Module, ModuleDict, split_keys
from ...nn.core import remat_layer, run_remat_stack, save_name
from ...ops.attention import attention_heads_packed
from .config import DenoiserConfig


def find_multiple(n: int, k: int) -> int:
    if n % k == 0:
        return n
    return n + k - (n % k)


def _act(name: str):
    return {
        "silu": jax.nn.silu,
        "swish": jax.nn.silu,
        "gelu": jax.nn.gelu,
        "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
        "relu": jax.nn.relu,
        "mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
    }[name]


def modulate(x: jax.Array, shift: jax.Array, scale: jax.Array) -> jax.Array:
    return x * (1 + scale[:, None, :]) + shift[:, None, :]


class AuraMLP(ModuleDict):
    """Gated SwiGLU-style MLP with n_hidden rounded to 256 (reference :95-119)."""

    def __init__(self, input_dim: int, hidden_dim: Optional[int] = None, hidden_act: str = "silu"):
        if hidden_dim is None:
            hidden_dim = 4 * input_dim
        n_hidden = find_multiple(int(2 * hidden_dim / 3), 256)
        self.act = _act(hidden_act)
        # fused-kernel activation name (None = act not fusable)
        self.act_name = {
            "silu": "silu", "swish": "silu",
            "gelu": "gelu", "gelu_new": "gelu_tanh",
        }.get(hidden_act)
        super().__init__(
            {
                "c_fc1": Linear(input_dim, n_hidden, bias=False),
                "c_fc2": Linear(input_dim, n_hidden, bias=False),
                "c_proj": Linear(n_hidden, input_dim, bias=False),
            }
        )

    def __call__(self, params, x):
        from ...ops.pallas.fused_mlp import fused_ff_enabled, gated_mlp, supported

        c, inner = params["c_proj"]["weight"].shape if not isinstance(
            params["c_proj"]["weight"], dict
        ) else (0, 0)
        if (
            self.act_name is not None
            and fused_ff_enabled(
                x, params["c_fc1"], params["c_fc2"], params["c_proj"],
                inner=inner,
            )
            and x.shape[-1] == c
            and supported(c, inner)
        ):
            # fused Pallas SwiGLU: both up-projections, the act gate and
            # the down-projection in one VMEM-resident kernel
            return gated_mlp(
                x,
                w_act=params["c_fc1"]["weight"],
                w_gate=params["c_fc2"]["weight"],
                w_down=params["c_proj"]["weight"],
                b_act=params["c_fc1"].get("bias"),
                b_gate=params["c_fc2"].get("bias"),
                b_down=params["c_proj"].get("bias"),
                act=self.act_name,
            )
        h1 = self.act(self["c_fc1"](params["c_fc1"], x))
        h2 = self["c_fc2"](params["c_fc2"], x)
        # saved under remat_layer's activation policy (c_proj's input)
        return self["c_proj"](params["c_proj"], save_name(h1 * h2, "ff_inner"))


class Modulation(ModuleDict):
    """act -> Linear(dim, n*dim, bias=False), torch Sequential key "1"."""

    def __init__(self, dim: int, n: int, hidden_act: str = "silu"):
        self.n = n
        self.act = _act(hidden_act)
        super().__init__({"1": Linear(dim, n * dim, bias=False)})

    def init(self, key, dtype=jnp.float32):
        p = super().init(key, dtype)
        # zero-init all mod projections (reference init_weights :660-663)
        p["1"]["weight"] = jnp.zeros_like(p["1"]["weight"])
        return p

    def __call__(self, params, cond):
        out = self["1"](params["1"], self.act(cond))
        return jnp.split(out, self.n, axis=-1)


def _qk_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Per-head Fp32LayerNorm without affine (reference :58-73, head_dim axis)."""
    dtype = x.dtype
    h = x.astype(jnp.float32)
    mean = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(h - mean), axis=-1, keepdims=True)
    return ((h - mean) * jax.lax.rsqrt(var + eps)).astype(dtype)


class SingleAttention(ModuleDict):
    def __init__(self, dim: int, n_heads: int, use_flash_attn: bool = False, use_rope: bool = False):
        self.n_heads = n_heads
        self.head_dim = dim // n_heads
        self.backend = "flash" if use_flash_attn else "xla"
        self.use_rope = use_rope
        super().__init__(
            {
                "w1q": Linear(dim, dim, bias=False),
                "w1k": Linear(dim, dim, bias=False),
                "w1v": Linear(dim, dim, bias=False),
                "w1o": Linear(dim, dim, bias=False),
            }
        )

    def __call__(self, params, condition, rope_freqs=None):
        b, s, _ = condition.shape
        h, d = self.n_heads, self.head_dim

        # heads-packed: per-head qk-norm / RoPE run on a (B, S, H, D)
        # VIEW (minor-dim reshape, no relayout); attention goes straight
        # from the packed (B, S, H*D) projection output through the BSHD
        # flash kernel on TPU — the (B,H,S,D) transposes never exist
        def heads(t):
            return t.reshape(b, s, h, d)

        q = _qk_norm(heads(self["w1q"](params["w1q"], condition)))
        k = _qk_norm(heads(self["w1k"](params["w1k"], condition)))
        v = self["w1v"](params["w1v"], condition)
        if self.use_rope and rope_freqs is not None:
            q, k = apply_rope_qk(q, k, rope_freqs[:, None])
        attn = attention_heads_packed(
            q.reshape(b, s, h * d), k.reshape(b, s, h * d), v, h,
            scale=1 / self.head_dim**0.5, backend=self.backend,
        )
        return self["w1o"](params["w1o"], attn)


class DoubleAttention(ModuleDict):
    """Separate cond/latent qkv, joint attention, split back (reference :217-334)."""

    def __init__(self, dim: int, n_heads: int, use_flash_attn: bool = False, use_rope: bool = False):
        self.n_heads = n_heads
        self.head_dim = dim // n_heads
        self.backend = "flash" if use_flash_attn else "xla"
        self.use_rope = use_rope
        super().__init__(
            {
                name: Linear(dim, dim, bias=False)
                for name in ("w1q", "w1k", "w1v", "w1o", "w2q", "w2k", "w2v", "w2o")
            }
        )

    def __call__(self, params, condition, latent, rope_freqs=None):
        b, cs, _ = condition.shape
        ls = latent.shape[1]
        h, d = self.n_heads, self.head_dim

        # heads-packed (see SingleAttention): (B, S, H, D) views for the
        # per-head qk-norm / RoPE, streams joined along the sequence axis,
        # BSHD flash kernel on TPU — no (B,H,S,D) transposes
        def heads(t, s):
            return t.reshape(b, s, h, d)

        cq = _qk_norm(heads(self["w1q"](params["w1q"], condition), cs))
        ck = _qk_norm(heads(self["w1k"](params["w1k"], condition), cs))
        lq = _qk_norm(heads(self["w2q"](params["w2q"], latent), ls))
        lk = _qk_norm(heads(self["w2k"](params["w2k"], latent), ls))

        q = jnp.concatenate([cq, lq], axis=1)
        k = jnp.concatenate([ck, lk], axis=1)
        v = jnp.concatenate(
            [self["w1v"](params["w1v"], condition),
             self["w2v"](params["w2v"], latent)], axis=1,
        )
        if self.use_rope and rope_freqs is not None:
            q, k = apply_rope_qk(q, k, rope_freqs[:, None])
        s = cs + ls
        attn = attention_heads_packed(
            q.reshape(b, s, h * d), k.reshape(b, s, h * d), v, h,
            backend=self.backend,
        )
        condition_out, latent_out = attn[:, :cs], attn[:, cs:]
        return (
            self["w1o"](params["w1o"], condition_out),
            self["w2o"](params["w2o"], latent_out),
        )


class MMDiTBlock(ModuleDict):
    """Dual-stream block with 6-way adaLN per stream (reference :336-425)."""

    def __init__(self, dim: int, heads: int, hidden_act: str = "silu",
                 use_flash_attn: bool = False, use_rope: bool = False):
        self.normC1 = LayerNorm(dim, elementwise_affine=False)
        self.normC2 = LayerNorm(dim, elementwise_affine=False)
        self.normX1 = LayerNorm(dim, elementwise_affine=False)
        self.normX2 = LayerNorm(dim, elementwise_affine=False)
        super().__init__(
            {
                "mlpC": AuraMLP(dim, dim * 4, hidden_act),
                "modC": Modulation(dim, 6, hidden_act),
                "mlpX": AuraMLP(dim, dim * 4, hidden_act),
                "modX": Modulation(dim, 6, hidden_act),
                "attn": DoubleAttention(dim, heads, use_flash_attn, use_rope),
            }
        )

    def __call__(self, params, condition, patches, global_cond, rope_freqs=None):
        condition_res, patches_res = condition, patches

        c_shift_msa, c_scale_msa, c_gate_msa, c_shift_mlp, c_scale_mlp, c_gate_mlp = (
            self["modC"](params["modC"], global_cond)
        )
        condition = modulate(self.normC1({}, condition), c_shift_msa, c_scale_msa)

        x_shift_msa, x_scale_msa, x_gate_msa, x_shift_mlp, x_scale_mlp, x_gate_mlp = (
            self["modX"](params["modX"], global_cond)
        )
        patches = modulate(self.normX1({}, patches), x_shift_msa, x_scale_msa)

        condition, patches = self["attn"](params["attn"], condition, patches, rope_freqs)

        condition = self.normC2(
            {}, save_name(condition_res + c_gate_msa[:, None, :] * condition, "res_stream")
        )
        condition = c_gate_mlp[:, None, :] * self["mlpC"](
            params["mlpC"], modulate(condition, c_shift_mlp, c_scale_mlp)
        )
        condition = condition_res + condition

        patches = self.normX2(
            {}, save_name(patches_res + x_gate_msa[:, None, :] * patches, "res_stream")
        )
        patches = x_gate_mlp[:, None, :] * self["mlpX"](
            params["mlpX"], modulate(patches, x_shift_mlp, x_scale_mlp)
        )
        patches = patches_res + patches

        return condition, patches


class DiTBlock(ModuleDict):
    """Single-stream block (reference :427-483)."""

    def __init__(self, dim: int, heads: int, hidden_act: str = "silu",
                 use_flash_attn: bool = False, use_rope: bool = False):
        self.norm1 = LayerNorm(dim, elementwise_affine=False)
        self.norm2 = LayerNorm(dim, elementwise_affine=False)
        super().__init__(
            {
                "modCX": Modulation(dim, 6, hidden_act),
                "attn": SingleAttention(dim, heads, use_flash_attn, use_rope),
                "mlp": AuraMLP(dim, dim * 4, hidden_act),
            }
        )

    def __call__(self, params, context, global_cond, rope_freqs=None):
        context_res = context
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = self["modCX"](
            params["modCX"], global_cond
        )
        context = modulate(self.norm1({}, context), shift_msa, scale_msa)
        context = self["attn"](params["attn"], context, rope_freqs)
        context = self.norm2(
            {}, save_name(context_res + gate_msa[:, None, :] * context, "res_stream")
        )
        mlp_out = self["mlp"](params["mlp"], modulate(context, shift_mlp, scale_mlp))
        return context_res + gate_mlp[:, None, :] * mlp_out


class TimestepEmbedder(ModuleDict):
    """Sinusoid (1000-scaled, cos-first) -> MLP (reference :485-524)."""

    def __init__(self, hidden_size: int, frequency_embedding_size: int = 256,
                 hidden_act: str = "silu"):
        self.frequency_embedding_size = frequency_embedding_size
        self.act = _act(hidden_act)
        super().__init__(
            {
                "mlp": ModuleDict(
                    {
                        "0": Linear(frequency_embedding_size, hidden_size),
                        "2": Linear(hidden_size, hidden_size),
                    }
                )
            }
        )

    @staticmethod
    def timestep_embedding(timestep: jax.Array, dim: int, max_period: int = 10000) -> jax.Array:
        half = dim // 2
        frequencies = 1000 * jnp.exp(
            -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
        )
        args = timestep.astype(jnp.float32)[:, None] * frequencies[None]
        embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
        if dim % 2:
            embedding = jnp.concatenate([embedding, jnp.zeros_like(embedding[:, :1])], axis=-1)
        return embedding

    def __call__(self, params, timestep):
        freq = self.timestep_embedding(timestep, self.frequency_embedding_size)
        mlp = self["mlp"]
        dtype = params["mlp"]["0"]["weight"].dtype
        h = mlp["0"](params["mlp"]["0"], freq.astype(dtype))
        return mlp["2"](params["mlp"]["2"], self.act(h))


class MMDiT(Module):
    """The AuraFlow MMDiT (reference denoiser.py:527-871), NHWC latents."""

    def __init__(self, config: DenoiserConfig):
        self.config = config
        self.inner_dim = config.attention_head_dim * config.num_attention_heads
        self.patch_size = config.patch_size
        self.out_channels = config.out_channels
        self.max_pos_embed_size = config.pos_embed_max_size
        self.h_max = int(config.pos_embed_max_size**0.5)
        self.w_max = int(config.pos_embed_max_size**0.5)
        self.n_register_tokens = config.num_register_tokens
        self.gradient_checkpointing = False
        self._pipeline = None  # (mesh, num_microbatches, axis) — set_pipeline

        act = config.hidden_act
        flash = config.use_flash_attn
        rope = config.use_rope

        self.t_embedder = TimestepEmbedder(self.inner_dim, hidden_act=act)
        self.cond_seq_linear = Linear(config.joint_attention_dim, config.caption_projection_dim, bias=False)
        self.init_x_linear = Linear(
            config.patch_size**2 * config.in_channels, self.inner_dim
        )
        self.rope_frequency = (
            RoPEFrequency(config.rope_dim_sizes, config.rope_theta) if rope else None
        )
        self.shortcut_embedder = (
            TimestepEmbedder(self.inner_dim, hidden_act=act) if config.use_shortcut else None
        )
        self.guidance_embedder = (
            TimestepEmbedder(self.inner_dim, hidden_act=act) if config.use_guidance else None
        )
        self.double_layers = [
            MMDiTBlock(self.inner_dim, config.num_attention_heads, act, flash, rope)
            for _ in range(config.num_double_layers)
        ]
        self.single_layers = [
            DiTBlock(self.inner_dim, config.num_attention_heads, act, flash, rope)
            for _ in range(config.num_single_layers)
        ]
        self.final_linear = Linear(
            self.inner_dim, config.patch_size**2 * config.out_channels, bias=False
        )
        self.modF = Modulation(self.inner_dim, 2, act)

    def init(self, key, dtype=jnp.float32):
        names = ["t_embedder", "cond_seq_linear", "init_x_linear", "pos", "reg",
                 "double", "single", "final", "modF", "shortcut", "guidance"]
        keys = split_keys(key, names)
        params = {
            "t_embedder": self.t_embedder.init(keys["t_embedder"], dtype),
            # zero-init (reference init_weights :666-668)
            "cond_seq_linear": {
                "weight": jnp.zeros(
                    (self.config.caption_projection_dim, self.config.joint_attention_dim), dtype
                )
            },
            "init_x_linear": self.init_x_linear.init(keys["init_x_linear"], dtype),
            "positional_encoding": jax.random.normal(
                keys["pos"], (1, self.max_pos_embed_size, self.inner_dim), dtype
            ) * 0.1,
            "register_tokens": jax.random.normal(
                keys["reg"], (1, self.n_register_tokens, self.inner_dim), dtype
            ) * 0.02,
            "final_linear": {
                "weight": jnp.zeros(
                    (self.config.patch_size**2 * self.out_channels, self.inner_dim), dtype
                )
            },
            "modF": self.modF.init(keys["modF"], dtype),
        }
        dkeys = jax.random.split(keys["double"], max(len(self.double_layers), 1))
        params["double_layers"] = {
            str(i): layer.init(k, dtype)
            for i, (layer, k) in enumerate(zip(self.double_layers, dkeys))
        }
        skeys = jax.random.split(keys["single"], max(len(self.single_layers), 1))
        params["single_layers"] = {
            str(i): layer.init(k, dtype)
            for i, (layer, k) in enumerate(zip(self.single_layers, skeys))
        }
        if self.shortcut_embedder is not None:
            params["shortcut_embedder"] = self.shortcut_embedder.init(keys["shortcut"], dtype)
        if self.guidance_embedder is not None:
            params["guidance_embedder"] = self.guidance_embedder.init(keys["guidance"], dtype)
        return params

    def set_gradient_checkpointing(self, enabled: bool):
        self.gradient_checkpointing = enabled

    def set_pipeline(self, mesh, num_microbatches: int, axis: str = "pipe"):
        """Opt-in GPipe pipelining of the double + single stacks over
        ``mesh[axis]`` (parallel/pipeline.py) — the scaling leg for this
        6.8B family, whose bf16 params exceed one 16 GB chip. Both stack
        depths (4 double / 32 single) must divide the pipe size.
        ``set_pipeline(None, 1)`` disables."""
        if mesh is not None:
            p = mesh.shape[axis]
            assert len(self.double_layers) % p == 0, (len(self.double_layers), p)
            assert len(self.single_layers) % p == 0, (len(self.single_layers), p)
        self._pipeline = (mesh, num_microbatches, axis) if mesh is not None else None

    # -- positional encoding --------------------------------------------------

    def pe_selection_index_based_on_dim(self, h: int, w: int) -> np.ndarray:
        """Center-crop PE grid selection (reference :678-700); static numpy."""
        h_p, w_p = h // self.patch_size, w // self.patch_size
        original = np.arange(self.max_pos_embed_size).reshape(self.h_max, self.w_max)
        start_h = self.h_max // 2 - h_p // 2
        start_w = self.w_max // 2 - w_p // 2
        return original[start_h : start_h + h_p, start_w : start_w + w_p].flatten()

    def get_pos_encoding(self, params, h: int, w: int) -> jax.Array:
        idx = self.pe_selection_index_based_on_dim(h, w)
        return params["positional_encoding"][:, idx]

    def _rope_freqs(self, cond_len: int, height: int, width: int) -> jax.Array:
        text_idx = self.rope_frequency.get_text_position_indices(cond_len)
        image_idx = self.rope_frequency.get_image_position_indices(height, width)
        return self.rope_frequency(np.concatenate([text_idx, image_idx], axis=0))

    def _position_encoding(self, params, patches, cond_len: int, height: int, width: int):
        """(patches, rope_freqs) for this resolution."""
        if self.rope_frequency is not None:
            return patches, self._rope_freqs(cond_len, height, width)
        patches = patches + self.get_pos_encoding(params, height, width).astype(
            patches.dtype
        )
        return patches, None

    # -- forward ----------------------------------------------------------------

    def _prepare_tokens(
        self,
        params,
        latent: jax.Array,
        encoder_hidden_states: jax.Array,
        timestep: jax.Array,
        shortcut_duration: Optional[jax.Array],
        guidance_scale: Optional[jax.Array],
    ):
        """Steps 1-3.5 of the forward (condition tokens, global cond,
        patchify, positional encoding). Shared by ``__call__`` and
        ``deepcache_forward``."""
        batch_size, height, width, _ = latent.shape

        # 1. condition tokens: projected text + register tokens
        cond_sequences = encoder_hidden_states[:batch_size]
        cond_tokens = self.cond_seq_linear(params["cond_seq_linear"], cond_sequences)
        register = jnp.broadcast_to(
            params["register_tokens"],
            (batch_size,) + params["register_tokens"].shape[1:],
        ).astype(cond_tokens.dtype)
        cond_tokens = jnp.concatenate([register, cond_tokens], axis=1)

        # 2. timestep embedding (+ shortcut / guidance)
        global_cond = self.t_embedder(params["t_embedder"], timestep)
        if shortcut_duration is not None:
            assert self.shortcut_embedder is not None
            global_cond = global_cond + self.shortcut_embedder(
                params["shortcut_embedder"], shortcut_duration
            )
        if guidance_scale is not None:
            assert self.guidance_embedder is not None
            # reference quirk: embeds the timestep, not the guidance scale
            global_cond = global_cond + self.guidance_embedder(
                params["guidance_embedder"], timestep
            )

        # 3. patchify + project
        patches = patchify(latent, self.patch_size)
        patches = self.init_x_linear(params["init_x_linear"], patches)

        # 3.5 positional encoding (overridable — the RoPE-migration trainer
        # blends learned PE with RoPE here)
        patches, rope_freqs = self._position_encoding(
            params, patches, cond_tokens.shape[1], height, width
        )
        return cond_tokens, patches, global_cond, rope_freqs, height, width

    def _run_single_range(self, params, context, global_cond, rope_freqs,
                          start: int = 0, end: Optional[int] = None):
        """Single (joint-sequence) layers [start, end) as a plain stack."""
        end = len(self.single_layers) if end is None else end
        return run_remat_stack(
            lambda layer, p, c: layer(p, c, global_cond, rope_freqs),
            self.single_layers[start:end],
            [params["single_layers"][str(i)] for i in range(start, end)],
            context,
            self.gradient_checkpointing,
        )

    def _finish(self, params, patches, global_cond, height: int, width: int):
        """Final modulation + projection + unpatchify (steps 6-7)."""
        f_shift, f_scale = self.modF(params["modF"], global_cond)
        patches = modulate(patches, f_shift, f_scale)
        patches = self.final_linear(params["final_linear"], patches)
        return unpatchify(
            patches,
            height // self.patch_size,
            width // self.patch_size,
            self.patch_size,
            self.out_channels,
        )

    def __call__(
        self,
        params,
        latent: jax.Array,  # (B, H, W, C)
        encoder_hidden_states: jax.Array,
        timestep: jax.Array,
        shortcut_duration: Optional[jax.Array] = None,
        guidance_scale: Optional[jax.Array] = None,
    ) -> jax.Array:
        cond_tokens, patches, global_cond, rope_freqs, height, width = (
            self._prepare_tokens(
                params, latent, encoder_hidden_states, timestep,
                shortcut_duration, guidance_scale,
            )
        )

        # 4. double layers (optionally GPipe-pipelined, see set_pipeline)
        wrap = remat_layer if self.gradient_checkpointing else None
        if self._pipeline is not None:
            from ...parallel.pipeline import run_pipelined_stack

            mesh, num_mb, axis = self._pipeline
            dblock = self.double_layers[0]

            def double_fn(lp, carry, static):
                c, x = dblock(lp, carry["c"], carry["x"], carry["g"], static)
                return {"c": c, "x": x, "g": carry["g"]}

            out = run_pipelined_stack(
                double_fn,
                [params["double_layers"][str(i)] for i in range(len(self.double_layers))],
                {"c": cond_tokens, "x": patches, "g": global_cond},
                rope_freqs,
                mesh, num_mb, axis=axis, wrap=wrap,
            )
            cond_tokens, patches = out["c"], out["x"]
        else:
            cond_tokens, patches = run_remat_stack(
                lambda layer, p, cx: layer(p, cx[0], cx[1], global_cond, rope_freqs),
                self.double_layers,
                [params["double_layers"][str(i)] for i in range(len(self.double_layers))],
                (cond_tokens, patches),
                self.gradient_checkpointing,
            )

        # 5. single layers over the joint sequence
        if self.single_layers:
            cond_len = cond_tokens.shape[1]
            context = jnp.concatenate([cond_tokens, patches], axis=1)
            if self._pipeline is not None:
                mesh, num_mb, axis = self._pipeline
                sblock = self.single_layers[0]

                def single_fn(lp, carry, static):
                    return {
                        "h": sblock(lp, carry["h"], carry["g"], static),
                        "g": carry["g"],
                    }

                context = run_pipelined_stack(
                    single_fn,
                    [params["single_layers"][str(i)] for i in range(len(self.single_layers))],
                    {"h": context, "g": global_cond},
                    rope_freqs,
                    mesh, num_mb, axis=axis, wrap=wrap,
                )["h"]
            else:
                context = self._run_single_range(
                    params, context, global_cond, rope_freqs
                )
            patches = context[:, cond_len:]

        # 6-7. final modulation + projection + unpatchify
        return self._finish(params, patches, global_cond, height, width)

    def deepcache_forward(
        self,
        params,
        latent: jax.Array,
        encoder_hidden_states: jax.Array,
        timestep: jax.Array,
        shortcut_duration: Optional[jax.Array] = None,
        guidance_scale: Optional[jax.Array] = None,
        cached_delta: Optional[jax.Array] = None,
        refresh: bool = True,
        cache_depth: Optional[int] = None,
    ):
        """DeepCache-style step caching for the MMDiT (same Delta-DiT
        scheme as Lumina2's ``NextDiT.deepcache_forward``; beyond the
        reference, which has no step caching).

        The single-layer joint stack is residual, so split it at
        ``cache_depth`` k: a full (``refresh=True``) step records
        ``delta = x_N - x_k``, the summed residual contribution of the
        deep suffix [k, N). A cached step runs the double layers and the
        shallow single prefix [0, k) fresh and approximates
        ``x_N = x_k + delta``. The double layers always run — they are 4
        of 36 on the full model and feed both streams. ``refresh`` is a
        static Python bool (host-driven sampling loop); each variant
        compiles separately. Returns ``(velocity, delta)``.
        """
        assert self._pipeline is None, "DeepCache is an inference-only path"
        n = len(self.single_layers)
        k = cache_depth if cache_depth is not None else max(1, n // 4)
        assert 0 < k < n, (k, n)

        cond_tokens, patches, global_cond, rope_freqs, height, width = (
            self._prepare_tokens(
                params, latent, encoder_hidden_states, timestep,
                shortcut_duration, guidance_scale,
            )
        )
        for i, layer in enumerate(self.double_layers):
            cond_tokens, patches = layer(
                params["double_layers"][str(i)], cond_tokens, patches,
                global_cond, rope_freqs,
            )
        cond_len = cond_tokens.shape[1]
        context = jnp.concatenate([cond_tokens, patches], axis=1)
        context = self._run_single_range(
            params, context, global_cond, rope_freqs, 0, k
        )
        if refresh:
            shallow = context
            context = self._run_single_range(
                params, context, global_cond, rope_freqs, k, n
            )
            delta = context - shallow
        else:
            assert cached_delta is not None
            context = context + cached_delta.astype(context.dtype)
            delta = cached_delta
        patches = context[:, cond_len:]
        velocity = self._finish(params, patches, global_cond, height, width)
        return velocity, delta


class Denoiser(MMDiT):
    """Config-constructed MMDiT (reference denoiser.py:873-902)."""

    @classmethod
    def from_config(cls, config: DenoiserConfig) -> "Denoiser":
        return cls(config)
