"""SDXL UNet denoiser — TPU-native functional implementation.

Behavioral spec: /root/reference/src/models/sdxl/denoiser.py (1268 LoC,
torch). This is a from-scratch JAX design, not a translation:

- Activations are **NHWC** end to end (channels ride the 128-lane TPU
  dimension; XLA convs tile onto the MXU without layout transposes).
  Conv kernels are *stored* OIHW so the param tree flattens to exactly
  the reference's torch state-dict keys (checkpoint interop).
- The block structure is built once in Python (static), so under jit the
  whole UNet traces to a single XLA graph; there is no isinstance
  dispatch at run time.
- Attention goes through the shared dispatch (ops/attention.py): "xla"
  einsum-softmax (XLA fuses) or the Pallas "flash" kernel.
- Gradient checkpointing = jax.checkpoint around each layer-list, the
  jax analogue of the reference's per-layer torch.utils.checkpoint
  (denoiser.py:592-605).

Param-tree key layout (flattened) matches the reference internal keys,
e.g. ``input_blocks.blocks.4.1.transformer_blocks.0.attn1.to_q.weight``;
`models/sdxl/util.py` converts to/from the sgm on-disk layout.

Known reference quirk NOT replicated: the reference UNet never forwards
``num_transformers_per_block`` to its DownBlocks (denoiser.py:1055-1070),
so its down path silently uses the [1, 2, 10] defaults whatever the
config says. We apply the config consistently to down/mid/up; identical
for every real SDXL checkpoint (whose config is the default).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Literal

import jax
import jax.numpy as jnp

from ...nn import Conv2d, GroupNorm, LayerNorm, Linear, Module, ModuleDict, split_keys
from ...nn.core import remat_layer, save_name
from ...modules.timestep.embedding import get_timestep_embedding
from ...ops.attention import AttentionImplementation, attention_heads_packed
from .config import DenoiserConfig


class MLPEmbedder(ModuleDict):
    """Linear -> SiLU -> Linear (torch Sequential keys "0", "2")."""

    def __init__(self, hidden_dim: int, time_embed_dim: int):
        super().__init__(
            {
                "0": Linear(hidden_dim, time_embed_dim),
                "2": Linear(time_embed_dim, time_embed_dim),
            }
        )

    def __call__(self, params, x):
        h = self["0"](params["0"], x)
        h = jax.nn.silu(h)
        return self["2"](params["2"], h)


class SelfAttention(ModuleDict):
    """to_q/to_k/to_v (no bias) + to_out.0; heads split on the fly."""

    def __init__(self, num_heads: int, head_dim: int, backend: AttentionImplementation):
        self.num_heads = num_heads
        self.head_dim = head_dim
        self.backend = backend
        inner = num_heads * head_dim
        super().__init__(
            {
                "to_q": Linear(inner, inner, bias=False),
                "to_k": Linear(inner, inner, bias=False),
                "to_v": Linear(inner, inner, bias=False),
                "to_out": ModuleDict({"0": Linear(inner, inner)}),
            }
        )

    def __call__(self, params, x):
        q = self["to_q"](params["to_q"], x)
        k = self["to_k"](params["to_k"], x)
        v = self["to_v"](params["to_v"], x)
        attn = attention_heads_packed(q, k, v, self.num_heads, backend=self.backend)
        return self["to_out"]["0"](params["to_out"]["0"], attn)


class CrossAttention(ModuleDict):
    def __init__(
        self,
        query_dim: int,
        context_dim: int,
        num_heads: int,
        head_dim: int,
        backend: AttentionImplementation,
    ):
        self.num_heads = num_heads
        self.head_dim = head_dim
        self.backend = backend
        inner = num_heads * head_dim
        super().__init__(
            {
                "to_q": Linear(query_dim, inner, bias=False),
                "to_k": Linear(context_dim, inner, bias=False),
                "to_v": Linear(context_dim, inner, bias=False),
                "to_out": ModuleDict({"0": Linear(inner, query_dim)}),
            }
        )

    def __call__(self, params, x, context, **kwargs):
        q = self["to_q"](params["to_q"], x)
        k = self["to_k"](params["to_k"], context)
        v = self["to_v"](params["to_v"], context)
        attn = attention_heads_packed(q, k, v, self.num_heads, backend=self.backend)
        return self["to_out"]["0"](params["to_out"]["0"], attn)


def _fused_ff_applies(p1, p2, x) -> bool:
    """Route the GeGLU ff through the fused Pallas kernel
    (ops/pallas/fused_mlp) when it is a pure bf16 dense ff on TPU: plain
    (non-quantized, adapter-free) weights with biases, lane-aligned
    shapes. Anything else — LoRA/LoHa deltas, NF4/fp8/W8A8 subtrees,
    fp32 golden-parity runs — keeps the XLA path, whose split/gelu
    numerics the parity suite pins. Width-auto default: the r4 on-chip
    A/B measured a wash at SDXL widths (inner <= 5120, below the 8192
    auto threshold), so SDXL stays on XLA unless VFT_FUSED_FF=1 forces
    the kernel — docs/PERFORMANCE.md "Round-4 measurements"."""
    from ...ops.pallas.fused_mlp import fused_ff_enabled, supported

    if "bias" not in p1 or "bias" not in p2:
        return False
    if isinstance(p2["weight"], dict):
        return False
    c, inner = p2["weight"].shape
    if not fused_ff_enabled(x, p1, p2, inner=inner):
        return False
    return x.shape[-1] == c and supported(c, inner)


class FeedForward(ModuleDict):
    """GeGLU feed-forward: net.0.proj (2x fused gate) -> gelu-gate -> net.2."""

    def __init__(self, hidden_dim: int, multiplier: float = 4.0):
        inner = int(hidden_dim * multiplier)
        super().__init__(
            {
                "net": ModuleDict(
                    {
                        "0": ModuleDict({"proj": Linear(hidden_dim, inner * 2)}),
                        "2": Linear(inner, hidden_dim),
                    }
                )
            }
        )

    def __call__(self, params, x):
        net = params["net"]
        p1, p2 = net["0"]["proj"], net["2"]
        if _fused_ff_applies(p1, p2, x):
            from ...ops.pallas.fused_mlp import geglu_mlp

            return geglu_mlp(x, p1["weight"], p1["bias"], p2["weight"], p2["bias"])
        h = self["net"]["0"]["proj"](net["0"]["proj"], x)
        h, gate = jnp.split(h, 2, axis=-1)
        # exact (erf) GELU in fp32 for golden parity with torch F.gelu;
        # tanh approximation on the bf16 fast path — the erf polynomial
        # costs 0.27 ms of serialized VPU time per ff at 64^2 on v5e
        # while the tanh form differs by <= the bf16 rounding step
        # (8e-3 max on unit-normal inputs)
        h = h * jax.nn.gelu(gate, approximate=gate.dtype == jnp.bfloat16)
        # post-gelu tag: saves the down-proj input (adapter-grad operand).
        # Saving PRE-split instead would also skip the wide up-projection
        # recompute, but costs 2x the bytes — measured OOM at batch 4
        # @1024px (18.4 GB needed of 15.75)
        h = save_name(h, "ff_inner")
        return self["net"]["2"](net["2"], h)


class TransformerBlock(ModuleDict):
    """pre-LN self-attn -> cross-attn -> GeGLU FF with residuals.

    ``cross_attention_class`` is pluggable (the functional analogue of the
    reference's transformer_block_class / attn2 module swap used by
    adapters, denoiser.py:213-283 + adapter managers)."""

    def __init__(
        self,
        hidden_dim: int,
        num_heads: int,
        head_dim: int,
        context_dim: int,
        backend: AttentionImplementation,
        cross_attention_class: type = None,
        cross_attention_extra: dict = None,
    ):
        cross_cls = cross_attention_class or CrossAttention
        extra = cross_attention_extra or {}
        super().__init__(
            {
                "attn1": SelfAttention(num_heads, head_dim, backend),
                "attn2": cross_cls(hidden_dim, context_dim, num_heads, head_dim, backend, **extra),
                "ff": FeedForward(hidden_dim),
                "norm1": LayerNorm(hidden_dim),
                "norm2": LayerNorm(hidden_dim),
                "norm3": LayerNorm(hidden_dim),
            }
        )

    def __call__(self, params, x, context, cross_attention_kwargs=None, hw=None):
        # hw = (height, width) of the current feature map; the base block
        # ignores it (positional adapters like RoPE consume it)
        # res_stream tags: saving the post-add stream lets the backward
        # read it directly instead of re-running the out-projection dots
        x = x + self["attn1"](params["attn1"], self["norm1"](params["norm1"], x))
        x = save_name(x, "res_stream")
        x = x + self["attn2"](
            params["attn2"], self["norm2"](params["norm2"], x), context,
            **(cross_attention_kwargs or {}),
        )
        x = save_name(x, "res_stream")
        x = x + self["ff"](params["ff"], self["norm3"](params["norm3"], x))
        return x


class SpatialTransformer(ModuleDict):
    """GroupNorm -> proj_in -> transformer blocks -> proj_out + residual.

    NHWC: the (B,H,W,C) -> (B,HW,C) flatten is a pure reshape (no
    permute), unlike the reference's NCHW version.
    """

    def __init__(
        self,
        in_channels: int,
        num_heads: int,
        head_dim: int,
        num_blocks: int,
        context_dim: int,
        backend: AttentionImplementation,
        cross_attention_class: type = None,
        cross_attention_extra: dict = None,
        transformer_block_class: type = None,
        transformer_block_extra: dict = None,
    ):
        inner = num_heads * head_dim
        self.inner_dim = inner
        tb_cls = transformer_block_class or TransformerBlock
        tb_extra = transformer_block_extra or {}
        super().__init__(
            {
                "norm": GroupNorm(32, in_channels, eps=1e-6),
                "proj_in": Linear(in_channels, inner),
                "transformer_blocks": ModuleDict(
                    {
                        str(i): tb_cls(
                            inner, num_heads, head_dim, context_dim, backend,
                            cross_attention_class, cross_attention_extra,
                            **tb_extra,
                        )
                        for i in range(num_blocks)
                    }
                ),
                "proj_out": Linear(inner, in_channels),
            }
        )

    def __call__(self, params, x, context, cross_attention_kwargs=None):
        b, hh, ww, c = x.shape
        residual = x
        h = self["norm"](params["norm"], x)
        h = h.reshape(b, hh * ww, c)
        h = self["proj_in"](params["proj_in"], h)
        blocks = self["transformer_blocks"]
        for i in range(len(blocks.children)):
            h = blocks[str(i)](
                params["transformer_blocks"][str(i)], h, context, cross_attention_kwargs,
                hw=(hh, ww),
            )
        h = self["proj_out"](params["proj_out"], h)
        return h.reshape(b, hh, ww, c) + residual


class ResidualBlock(ModuleDict):
    """GN/SiLU/Conv + time-emb add + GN/SiLU/Conv with skip connection.

    Only the updown_type="none" variant exists: SDXL never instantiates
    the up/down resblock paths (reference denoiser.py:489 always gets
    updown_type="none" from Down/Up/MidBlocks).
    """

    def __init__(self, in_channels: int, embedding_dim: int, out_channels: int):
        self.has_skip_conv = in_channels != out_channels
        children = {
            "in_layers": ModuleDict(
                {
                    "0": GroupNorm(32, in_channels, eps=1e-5),
                    "2": Conv2d(in_channels, out_channels, 3, padding=1),
                }
            ),
            "emb_layers": ModuleDict({"1": Linear(embedding_dim, out_channels)}),
            "out_layers": ModuleDict(
                {
                    "0": GroupNorm(32, out_channels, eps=1e-5),
                    "3": Conv2d(out_channels, out_channels, 3, padding=1),
                }
            ),
        }
        if self.has_skip_conv:
            children["skip_connection"] = Conv2d(in_channels, out_channels, 1)
        super().__init__(children)

    def __call__(self, params, x, emb):
        h = self["in_layers"]["0"](params["in_layers"]["0"], x)
        h = jax.nn.silu(h)
        h = self["in_layers"]["2"](params["in_layers"]["2"], h)

        e = self["emb_layers"]["1"](params["emb_layers"]["1"], jax.nn.silu(emb))
        h = h + e[:, None, None, :]
        # saved so the second GroupNorm's backward doesn't re-run conv1
        h = save_name(h, "conv_out")

        h = self["out_layers"]["0"](params["out_layers"]["0"], h)
        h = jax.nn.silu(h)
        h = self["out_layers"]["3"](params["out_layers"]["3"], h)

        if self.has_skip_conv:
            x = self["skip_connection"](params["skip_connection"], x)
        return h + x


class Downsample(ModuleDict):
    """Strided conv (conv_resample=True; SDXL never uses avg-pool)."""

    def __init__(self, channels: int, out_channels: int):
        super().__init__({"op": Conv2d(channels, out_channels, 3, stride=2, padding=1)})

    def __call__(self, params, x):
        return self["op"](params["op"], x)


class Upsample(ModuleDict):
    """Nearest 2x upsample + conv. NHWC nearest = repeat along H and W."""

    def __init__(self, channels: int, out_channels: int):
        super().__init__({"conv": Conv2d(channels, out_channels, 3, padding=1)})

    def __call__(self, params, x):
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return self["conv"](params["conv"], x)


def _build_down_blocks(config: DenoiserConfig, time_embed_dim: int,
                       cross_attention_class=None, cross_attention_extra=None,
                       transformer_block_class=None, transformer_block_extra=None):
    """Flat list of layer-lists mirroring reference DownBlocks
    (denoiser.py:613-771): conv stem, resblocks(+transformers),
    downsamples between stages. Returns (ModuleDict tree, structure)."""
    backend = config.attention_backend
    lists: list[list[tuple[str, Module]]] = []
    current = config.in_channels
    n_stages = len(config.down_blocks)
    for i, (block, out_ch, n_tf) in enumerate(
        zip(config.down_blocks, config.block_out_channels, config.num_transformers_per_block)
    ):
        if block == "DownBlock2D":
            lists.append([("conv", Conv2d(current, config.block_out_channels[0], 3, padding=1))])
            current = out_ch
            for _ in range(config.layers_per_block):
                lists.append([("res", ResidualBlock(current, time_embed_dim, out_ch))])
        elif block == "TransformerDownBlock2D":
            for _ in range(config.layers_per_block):
                layer = [("res", ResidualBlock(current, time_embed_dim, out_ch))]
                current = out_ch
                layer.append(
                    (
                        "st",
                        SpatialTransformer(
                            out_ch,
                            out_ch // config.num_head_channels,
                            config.num_head_channels,
                            n_tf,
                            config.context_dim,
                            backend,
                            cross_attention_class,
                            cross_attention_extra,
                            transformer_block_class,
                            transformer_block_extra,
                        ),
                    )
                )
                lists.append(layer)
        else:
            raise ValueError(f"Invalid down block: {block}")
        if i != n_stages - 1:
            lists.append([("down", Downsample(out_ch, out_ch))])
    return lists


def _build_up_blocks(config: DenoiserConfig, time_embed_dim: int,
                     cross_attention_class=None, cross_attention_extra=None,
                     transformer_block_class=None, transformer_block_extra=None):
    """Mirror of reference UpBlocks (denoiser.py:860-1004): reversed
    channels, layers_per_block+1 resblocks per stage, skip-channel pops,
    trailing Upsample attached to the stage's last layer-list."""
    backend = config.attention_backend
    # skip-connection channel bookkeeping (reference UNet __init__:1096-1106)
    skips: list[int] = []
    for i, (block, ch) in enumerate(zip(config.down_blocks, config.block_out_channels)):
        if block == "DownBlock2D":
            skips.extend([ch] * (config.layers_per_block + 1))
        else:
            skips.extend([ch] * config.layers_per_block)
        if i != len(config.down_blocks) - 1:
            skips.append(ch)

    up_channels = config.block_out_channels[::-1]
    up_n_tf = config.num_transformers_per_block[::-1]
    layers_per = config.layers_per_block + 1

    lists: list[list[tuple[str, Module]]] = []
    current = config.block_out_channels[-1]
    for i, (block, out_ch, n_tf) in enumerate(zip(config.up_blocks, up_channels, up_n_tf)):
        for _ in range(layers_per):
            layer = [("res", ResidualBlock(current + skips.pop(), time_embed_dim, out_ch))]
            current = out_ch
            if block == "TransformerUpBlock2D":
                layer.append(
                    (
                        "st",
                        SpatialTransformer(
                            out_ch,
                            out_ch // config.num_head_channels,
                            config.num_head_channels,
                            n_tf,
                            config.context_dim,
                            backend,
                            cross_attention_class,
                            cross_attention_extra,
                            transformer_block_class,
                            transformer_block_extra,
                        ),
                    )
                )
            lists.append(layer)
        if i != len(config.up_blocks) - 1:
            lists[-1].append(("up", Upsample(out_ch, out_ch)))
    return lists


class _BlockStack(Module):
    """A stack of layer-lists with torch-Sequential-style numeric keys
    under a "blocks" subtree (matches reference `.blocks` ModuleList)."""

    def __init__(self, lists: list[list[tuple[str, Module]]]):
        self.lists = lists

    def init(self, key, dtype=jnp.float32):
        blocks: dict = {}
        for i, layer_list in enumerate(self.lists):
            sub: dict = {}
            for j, (_, module) in enumerate(layer_list):
                key, sub_key = jax.random.split(key)
                p = module.init(sub_key, dtype)
                if p:
                    sub[str(j)] = p
            blocks[str(i)] = sub
        return {"blocks": blocks}


class UNet(Module):
    """The SDXL UNet (reference denoiser.py:1007-1236), NHWC-native.

    ``__call__(params, latents, timestep, encoder_hidden_states,
    encoder_pooler_output, original_size, target_size,
    crop_coords_top_left)`` with latents (B, H, W, C).
    """

    # pluggable cross-attention / transformer block (adapters override on
    # subclasses — the functional analogue of the reference's
    # transformer_block_class, adapter/rope.py:446-447)
    cross_attention_class: type = None
    cross_attention_extra: dict = None
    transformer_block_class: type = None
    transformer_block_extra: dict = None

    def __init__(self, config: DenoiserConfig):
        self.config = config
        self.hidden_dim = config.hidden_dim
        self.time_embed_dim = config.hidden_dim * 4
        self.additional_cond_dim = config.additional_condition_dim
        self.gradient_checkpointing = False

        self.time_embed = MLPEmbedder(config.hidden_dim, self.time_embed_dim)
        # wrapped in one extra Sequential level to match original keys
        # (reference denoiser.py:1057-1060)
        self.label_emb = ModuleDict(
            {"0": MLPEmbedder(config.global_cond_dim, self.time_embed_dim)}
        )
        ca_cls, ca_extra = self.cross_attention_class, self.cross_attention_extra
        tb_cls, tb_extra = self.transformer_block_class, self.transformer_block_extra
        self.input_lists = _build_down_blocks(
            config, self.time_embed_dim, ca_cls, ca_extra, tb_cls, tb_extra
        )
        mid_ch = config.block_out_channels[-1]
        self.middle_list = [
            ("res", ResidualBlock(mid_ch, self.time_embed_dim, mid_ch)),
            (
                "st",
                SpatialTransformer(
                    mid_ch,
                    mid_ch // config.num_head_channels,
                    config.num_head_channels,
                    config.num_transformers_per_block[-1],
                    config.context_dim,
                    config.attention_backend,
                    ca_cls,
                    ca_extra,
                    tb_cls,
                    tb_extra,
                ),
            ),
            ("res", ResidualBlock(mid_ch, self.time_embed_dim, mid_ch)),
        ]
        self.output_lists = _build_up_blocks(
            config, self.time_embed_dim, ca_cls, ca_extra, tb_cls, tb_extra
        )
        self.out_norm = GroupNorm(32, config.hidden_dim, eps=1e-5)
        self.out_conv = Conv2d(config.hidden_dim, config.out_channels, 3, padding=1)

        self._input_stack = _BlockStack(self.input_lists)
        self._output_stack = _BlockStack(self.output_lists)

    def init(self, key, dtype=jnp.float32):
        keys = split_keys(
            key, ["time_embed", "label_emb", "input", "middle", "output", "out0", "out2"]
        )
        middle: dict = {}
        mkey = keys["middle"]
        for j, (_, module) in enumerate(self.middle_list):
            mkey, sub = jax.random.split(mkey)
            middle[str(j)] = module.init(sub, dtype)
        return {
            "time_embed": self.time_embed.init(keys["time_embed"], dtype),
            "label_emb": self.label_emb.init(keys["label_emb"], dtype),
            "input_blocks": self._input_stack.init(keys["input"], dtype),
            "middle_block": {"blocks": middle},
            "output_blocks": self._output_stack.init(keys["output"], dtype),
            "out": {
                "0": self.out_norm.init(keys["out0"], dtype),
                "2": self.out_conv.init(keys["out2"], dtype),
            },
        }

    # -- conditioning ------------------------------------------------------

    def prepare_global_condition(
        self,
        params,
        timestep: jax.Array,
        text_pooler_output: jax.Array,
        original_size: jax.Array,
        target_size: jax.Array,
        crop_coords: jax.Array,
        dtype,
    ):
        """Timestep sinusoid + 6x256-d size Fourier + pooled text -> MLPs
        (reference denoiser.py:1125-1178)."""
        time_sin = get_timestep_embedding(
            timestep, self.hidden_dim, flip_sin_to_cos=True, downscale_freq_shift=0.0
        ).astype(dtype)
        time_embed = self.time_embed(params["time_embed"], time_sin)

        batch = text_pooler_output.shape[0]
        additional = jnp.concatenate(
            [original_size, crop_coords, target_size], axis=1
        ).reshape(-1)
        additional = get_timestep_embedding(
            additional, self.additional_cond_dim, flip_sin_to_cos=True, downscale_freq_shift=0.0
        ).reshape(batch, -1)
        global_cond = jnp.concatenate(
            [text_pooler_output, additional.astype(text_pooler_output.dtype)], axis=1
        ).astype(dtype)
        global_cond = self.label_emb["0"](params["label_emb"]["0"], global_cond)
        return time_embed, global_cond + time_embed

    # -- forward -----------------------------------------------------------

    def _apply_layer_list(
        self, layer_list, list_params, x, context, global_cond, cross_attention_kwargs=None
    ):
        def run(x, list_params, context, global_cond):
            for j, (kind, module) in enumerate(layer_list):
                p = list_params.get(str(j), {})
                if kind == "res":
                    x = module(p, x, global_cond)
                elif kind == "st":
                    x = module(p, x, context, cross_attention_kwargs)
                else:  # conv / down / up
                    x = module(p, x)
            return x

        if self.gradient_checkpointing:
            run = remat_layer(run)
        return run(x, list_params, context, global_cond)

    def __call__(
        self,
        params,
        latents: jax.Array,
        timestep: jax.Array,
        encoder_hidden_states: jax.Array,
        encoder_pooler_output: jax.Array,
        original_size: jax.Array,
        target_size: jax.Array,
        crop_coords_top_left: jax.Array,
        cross_attention_kwargs: dict = None,
    ) -> jax.Array:
        time_embed, global_cond = self.prepare_global_condition(
            params,
            timestep,
            encoder_pooler_output,
            original_size,
            target_size,
            crop_coords_top_left,
            latents.dtype,
        )
        context = encoder_hidden_states

        # adapters receive the raw time embedding (adaln_zero/time_gate
        # variants condition their gates on it; reference denoiser.py:268-274
        # always threads it and base CrossAttention ignores it)
        cross_attention_kwargs = dict(cross_attention_kwargs or {})
        cross_attention_kwargs.setdefault("time_embedding", time_embed)

        h = latents
        h, skips = self._run_input_blocks(
            params, h, context, global_cond, cross_attention_kwargs
        )
        h = self._run_middle(params, h, context, global_cond, cross_attention_kwargs)
        h = self._run_output_blocks(
            params, h, skips, context, global_cond, cross_attention_kwargs
        )
        return self._out_head(params, h)

    # -- forward segments (shared by the plain forward and DeepCache) --------

    def _run_input_blocks(self, params, h, context, global_cond, cakw, upto=None):
        """Apply input blocks [0, upto); returns (h, skips)."""
        skips = []
        in_blocks = params["input_blocks"]["blocks"]
        for i, layer_list in enumerate(self.input_lists[:upto]):
            h = self._apply_layer_list(
                layer_list, in_blocks[str(i)], h, context, global_cond, cakw
            )
            skips.append(h)
        return h, skips

    def _run_middle(self, params, h, context, global_cond, cakw):
        mid = params["middle_block"]["blocks"]
        return self._apply_layer_list(
            [(k, m) for k, m in self.middle_list],
            {str(j): mid[str(j)] for j in range(len(self.middle_list))},
            h, context, global_cond, cakw,
        )

    def _run_output_blocks(self, params, h, skips, context, global_cond, cakw,
                           start=0, end=None):
        """Apply output blocks [start, end), consuming ``skips`` LIFO."""
        skips = list(skips)
        out_blocks = params["output_blocks"]["blocks"]
        for i, layer_list in enumerate(self.output_lists):
            if i < start or (end is not None and i >= end):
                continue
            h = jnp.concatenate([h, skips.pop()], axis=-1)
            h = self._apply_layer_list(
                layer_list, out_blocks[str(i)], h, context, global_cond, cakw
            )
        return h

    def _out_head(self, params, h):
        h = self.out_norm(params["out"]["0"], h)
        h = jax.nn.silu(h)
        return self.out_conv(params["out"]["2"], h)

    def deepcache_forward(
        self,
        params,
        latents: jax.Array,
        timestep: jax.Array,
        encoder_hidden_states: jax.Array,
        encoder_pooler_output: jax.Array,
        original_size: jax.Array,
        target_size: jax.Array,
        crop_coords_top_left: jax.Array,
        cached_deep: jax.Array,
        refresh: jax.Array,  # bool scalar: True = full pass, recompute cache
        cache_depth: int = 3,
        cross_attention_kwargs: dict = None,
    ) -> tuple[jax.Array, jax.Array]:
        """DeepCache inference step (Ma et al. 2023, arXiv:2312.00858 —
        beyond the reference, which has no step caching): the deep UNet
        features change slowly across adjacent denoise steps, so cached
        steps run only the ``cache_depth`` shallowest input blocks and
        output blocks, splicing in ``cached_deep`` (the feature entering
        the shallow output suffix from the last full pass). Returns
        (noise_pred, deep_feature). Shapes are static across steps, so a
        ``lax.cond`` on ``refresh`` in the scanned denoise loop executes
        only one branch per step at runtime."""
        time_embed, global_cond = self.prepare_global_condition(
            params, timestep, encoder_pooler_output, original_size,
            target_size, crop_coords_top_left, latents.dtype,
        )
        context = encoder_hidden_states
        cakw = dict(cross_attention_kwargs or {})
        cakw.setdefault("time_embedding", time_embed)
        n_out = len(self.output_lists)
        assert 0 < cache_depth < n_out, (cache_depth, n_out)
        start = n_out - cache_depth  # first shallow output block index

        def full(_):
            h, skips = self._run_input_blocks(
                params, latents, context, global_cond, cakw
            )
            h = self._run_middle(params, h, context, global_cond, cakw)
            # deep output blocks [0, start) consume the deep skips
            h = self._run_output_blocks(
                params, h, skips[cache_depth:], context, global_cond, cakw,
                end=start,
            )
            deep = h
            h = self._run_output_blocks(
                params, h, skips[:cache_depth], context, global_cond, cakw,
                start=start,
            )
            return self._out_head(params, h), deep

        def cached(deep):
            h, skips = self._run_input_blocks(
                params, latents, context, global_cond, cakw, upto=cache_depth
            )
            h = self._run_output_blocks(
                params, deep, skips, context, global_cond, cakw, start=start
            )
            return self._out_head(params, h), deep

        if cached_deep is None:
            # no carry yet (shape bootstrap / first step): full pass only
            return full(None)
        return jax.lax.cond(refresh, full, cached, cached_deep)

    def set_gradient_checkpointing(self, enabled: bool):
        self.gradient_checkpointing = enabled


class Denoiser(UNet):
    """Config-constructed UNet (reference denoiser.py:1239-1268)."""

    def __init__(self, config: DenoiserConfig):
        super().__init__(config)
