"""Functional NN core.

Models are *static* configuration objects ("modules") paired with *pure*
parameter pytrees. A module never stores arrays; it only knows shapes and
how to apply parameters. Parameter trees are nested ``dict``s whose
flattened dotted keys exactly match the PyTorch state-dict layout of the
reference framework (p1atdev/vision-ft), so safetensors checkpoints map to
param trees with nothing but a flatten/unflatten and the same key
converters the reference uses.

Conventions (chosen for torch-checkpoint interop; cf. reference layouts in
/root/reference/src/models/sdxl/denoiser.py):
  - Linear weight:  [out_features, in_features]  (+ optional bias [out])
  - Conv2d weight:  [out_ch, in_ch, kh, kw] (OIHW), activations are NHWC
    (TPU-native: channels ride the 128-lane dimension). XLA's
    dimension_numbers handle the layout; no transposes are materialized.
  - Norm scales/offsets: "weight"/"bias" names, fp32 compute islands.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Any, Iterable

import jax
import jax.numpy as jnp
from jax import lax

Params = dict[str, Any]


# ---------------------------------------------------------------------------
# Param-tree utilities


def flatten_params(tree: Params, prefix: str = "", sep: str = ".") -> dict[str, jax.Array]:
    """Flatten a nested param dict to dotted state-dict keys."""
    flat: dict[str, jax.Array] = {}
    for name, value in tree.items():
        key = f"{prefix}{sep}{name}" if prefix else name
        if isinstance(value, dict):
            flat.update(flatten_params(value, key, sep))
        else:
            flat[key] = value
    return flat


def unflatten_params(flat: dict[str, jax.Array], sep: str = ".") -> Params:
    """Inverse of :func:`flatten_params`."""
    tree: Params = {}
    for key, value in flat.items():
        parts = key.split(sep)
        node = tree
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return tree


def split_keys(key: jax.Array, names: Iterable[str]) -> dict[str, jax.Array]:
    names = list(names)
    keys = jax.random.split(key, len(names))
    return dict(zip(names, keys))


def param_dtype(params: Params) -> jnp.dtype:
    leaves = jax.tree.leaves(params)
    return leaves[0].dtype if leaves else jnp.float32


def tree_size(params: Params) -> int:
    return sum(x.size for x in jax.tree.leaves(params))


# ---------------------------------------------------------------------------
# Module base


class Module:
    """Static-config module: holds no arrays, provides init() and __call__().

    Subclasses implement ``init(key, dtype) -> Params`` and
    ``__call__(params, *args) -> Array``. Composite modules recurse.
    """

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        raise NotImplementedError

    def __call__(self, params: Params, *args, **kwargs):
        raise NotImplementedError


class Identity(Module):
    def init(self, key, dtype=jnp.float32) -> Params:
        return {}

    def __call__(self, params, x):
        return x


_TRACE_FLAGS: dict = {}


def register_trace_flag(name: str, getter) -> None:
    """Register a trace-time global (like the PEFT enable toggle) so
    cached_jit keys its cache on the flag's current value — a cached
    trace that baked the old value is never served after a toggle."""
    _TRACE_FLAGS[name] = getter


def _trace_flags_key() -> tuple:
    return tuple((k, _TRACE_FLAGS[k]()) for k in sorted(_TRACE_FLAGS))


def cached_jit(obj, name: str, fn, **jit_kwargs):
    """Per-instance jit cache for module-level entry points (text-encoder
    towers, VAE encode/decode, denoise steps). Eager op-by-op dispatch
    through the axon tunnel costs ~50-100 ms per op — an unjitted CLIP
    forward measured 48 s — so every pipeline stage a user can reach must
    run under one jit. jax.jit's own shape cache handles varying input
    shapes; trace-time toggles (set_peft_enabled / set_rope_enabled) are
    part of the cache key via register_trace_flag."""
    cache = getattr(obj, "_jit_cache", None)
    if cache is None:
        cache = obj._jit_cache = {}
    key = (name, _trace_flags_key())
    if key not in cache:
        cache[key] = jax.jit(fn, **jit_kwargs)
    return cache[key]


_REMAT_SAVE_QKV: list[bool] = [True]
_REMAT_SAVE_FF: list[bool] = [True]
_REMAT_SAVE_KERNEL: list[bool] = [True]


def set_remat_saves(mode: str) -> None:
    """Config-level remat-save policy (TrainerConfig.remat_saves):
    "activations" saves kernel outputs + qkv + tagged activations,
    "kernel" only the flash (out, lse) outputs, "none" is plain full
    remat."""
    if mode not in ("activations", "kernel", "none"):
        raise ValueError(f"unknown remat_saves mode: {mode!r}")
    _REMAT_SAVE_KERNEL[0] = mode in ("activations", "kernel")
    _REMAT_SAVE_QKV[0] = mode == "activations"
    _REMAT_SAVE_FF[0] = mode == "activations"


def set_remat_save_qkv(enabled: bool) -> None:
    """Trace-time toggle: whether remat_layer also saves the flash
    kernels' padded q/k/v inputs (skips rematerializing the projection
    dots in the backward at ~3 extra saved (B,S,H*D) tensors per
    attention). Turn OFF for memory-tight runs (e.g. 6.8B+ bases on a
    single 16 GB chip)."""
    _REMAT_SAVE_QKV[0] = enabled


def set_remat_save_ff(enabled: bool) -> None:
    """Trace-time toggle for the *activation* saves: tensors tagged
    ``ff_inner`` (gated feed-forward product — the ff down projection's
    input), ``res_stream`` (post-residual-add transformer stream — skips
    re-running the attention out-projection dots), and ``conv_out``
    (ResBlock mid activation — skips re-running conv1). Turn OFF when
    memory-tight."""
    _REMAT_SAVE_FF[0] = enabled


_REMAT_GROUP: list[int] = [1]


def set_remat_group(group: int) -> None:
    """Trace-time knob: checkpoint uniform layer stacks in groups of
    ``group`` layers instead of one remat block per layer. Backward
    recompute FLOPs are identical (every layer is recomputed exactly
    once either way); what changes is memory shape — boundary saves
    shrink by the group factor (one saved stream per group instead of
    per layer) while the backward's live working set grows ~group
    layer-intermediates. The fit for big uniform stacks on a small
    HBM: AuraFlow b4@1024 keeps 36 x 102 MB boundaries with group=1,
    which OOMs a 16 GB chip next to its 3.4 GB NF4 base."""
    if group < 1:
        raise ValueError(f"remat group must be >= 1, got {group}")
    _REMAT_GROUP[0] = group


def remat_group() -> int:
    return _REMAT_GROUP[0]


register_trace_flag("remat_group", remat_group)


def save_name(x, name: str):
    """Tag ``x`` with a checkpoint name so remat_layer policies can
    choose to save it across the forward/backward boundary."""
    from jax.ad_checkpoint import checkpoint_name

    return checkpoint_name(x, name)


def remat_layer(fn):
    """Gradient-checkpoint a layer group, SAVING the Pallas flash-attention
    residuals (the ``flash_out``/``flash_lse``/``flash_qkv``
    checkpoint_names tagged inside the kernels' custom-VJP forwards)
    instead of re-running the attention kernels — and, with qkv saved,
    the projection dots feeding them — during the backward pass.
    Everything else is rematerialized as with plain ``jax.checkpoint``.
    On paths with no flash attention the policy saves nothing, i.e.
    plain full remat."""
    names = ["flash_out", "flash_lse"] if _REMAT_SAVE_KERNEL[0] else []
    if _REMAT_SAVE_QKV[0]:
        names.append("flash_qkv")
    if _REMAT_SAVE_FF[0]:
        names += ["ff_inner", "res_stream", "conv_out"]
    if not names:
        return jax.checkpoint(fn)
    return jax.checkpoint(
        fn, policy=jax.checkpoint_policies.save_only_these_names(*names)
    )


def run_remat_stack(apply_fn, layers, params_list, carry, enabled: bool):
    """Run a uniform layer stack ``carry = apply_fn(layer, p, carry)``,
    gradient-checkpointed in groups of :func:`remat_group` layers when
    ``enabled``. With group=1 this is exactly the classic one-remat-per-
    layer loop; larger groups trade backward working set for fewer saved
    inter-layer boundary streams (see :func:`set_remat_group`)."""
    if not enabled:
        for layer, p in zip(layers, params_list):
            carry = apply_fn(layer, p, carry)
        return carry
    g = remat_group()
    i, n = 0, len(layers)
    while i < n:
        j = min(i + g, n)

        def chunk_fn(ps, c, _sub=tuple(layers[i:j])):
            for layer, p in zip(_sub, ps):
                c = apply_fn(layer, p, c)
            return c

        carry = remat_layer(chunk_fn)(list(params_list[i:j]), carry)
        i = j
    return carry


_PEFT_ENABLED: list[bool] = [True]


def set_peft_enabled(enabled: bool) -> None:
    """Trace-time global toggle for adapter application (the functional
    analogue of the reference's per-layer ``enabled`` flag,
    /root/reference/src/modules/peft/lora.py:95-99). Jitted callables
    capture the flag at trace time — re-jit after toggling."""
    _PEFT_ENABLED[0] = enabled


def peft_enabled() -> bool:
    return _PEFT_ENABLED[0]


register_trace_flag("peft", peft_enabled)


def _linear_adapter_delta(params: Params, x: jax.Array) -> jax.Array | None:
    """LoRA / LoHa delta for a Linear whose params carry adapter subtrees.

    Key layout matches the reference torch state dicts exactly
    (lora_down.weight/lora_up.weight/alpha — src/modules/peft/lora.py:19-66;
    hada_w1_a.. — loha.py:22-60), so adapter safetensors round-trip with
    nothing but flatten/unflatten.
    """
    if not _PEFT_ENABLED[0]:
        return None
    if "lora_down" in params:
        down_w = params["lora_down"]["weight"]
        up_w = params["lora_up"]["weight"]
        rank = down_w.shape[0]
        scale = (params["alpha"].astype(jnp.float32) / rank).astype(x.dtype)
        h = x @ down_w.astype(x.dtype).T
        h = h @ up_w.astype(x.dtype).T
        if "bias" in params["lora_up"]:
            h = h + params["lora_up"]["bias"].astype(x.dtype)
        return h * scale
    if "hada_w1_a" in params:
        w1 = params["hada_w1_a"].astype(jnp.float32) @ params["hada_w1_b"].astype(jnp.float32)
        w2 = params["hada_w2_a"].astype(jnp.float32) @ params["hada_w2_b"].astype(jnp.float32)
        rank = params["hada_w1_a"].shape[1]
        scale = params["alpha"].astype(jnp.float32) / rank
        weight = (w1 * w2).astype(x.dtype)  # (in, out)
        return (x @ weight) * scale.astype(x.dtype)
    return None


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _lora_concat_dot(x2, w, down_w, up_w, scale):
    """``x2 @ w^T + ((x2 @ down^T) * scale) @ up^T`` as ONE matmul.

    The separate-delta formulation writes a full (M, N) delta and
    re-reads the base output to add it — ~2 extra output-sized HBM round
    trips per Linear per pass (the r4 Lumina2 train profile charged
    ~119 ms/step to the rank-16 up-projection dot alone, core.py:282).
    Concatenating the rank-r hidden onto x and ``up`` onto ``w`` turns
    that into one (M, K+r) @ (K+r, N) dot that writes the output once;
    the extra traffic is one x-sized and one weight-sized copy — ~5x
    less at the family shapes. The custom VJP keeps LoRA's training
    economics: no (N, K+r) concat-weight gradient is ever formed (plain
    AD through the concat would compute one, re-adding the full dW
    matmul LoRA exists to avoid).
    """
    y, _ = _lora_concat_fwd(x2, w, down_w, up_w, scale)
    return y


def _lora_concat_fwd(x2, w, down_w, up_w, scale):
    dt = x2.dtype
    h = (x2 @ down_w.astype(dt).T) * scale  # (M, r)
    x_aug = jnp.concatenate([x2, h], axis=1)
    w_aug = jnp.concatenate([w.astype(dt), up_w.astype(dt)], axis=1)
    y = lax.dot_general(
        x_aug, w_aug, (((1,), (1,)), ((), ())),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=dt,
    )
    return y, (x2, w, down_w, up_w, scale, h)


def _lora_concat_bwd(res, dy):
    x2, w, down_w, up_w, scale, h = res
    dt = x2.dtype
    dy = dy.astype(dt)
    # dx = dy @ W + ((dy @ up) * scale) @ down — the one big dot plus two
    # rank-r dots; dW is a symbolic zero (frozen base: the cotangent is
    # dead at the jax.grad(trainable) boundary and DCE'd by XLA)
    dh = dy @ up_w.astype(dt)  # (M, r)
    dx = lax.dot_general(
        dy, w.astype(dt), (((1,), (0,)), ((), ())),
        precision=lax.Precision.HIGHEST, preferred_element_type=dt,
    ) + (dh * scale) @ down_w.astype(dt)
    d_down = lax.dot_general(
        (dh * scale), x2, (((0,), (0,)), ((), ())),
        precision=lax.Precision.HIGHEST, preferred_element_type=dt,
    )  # (r, K)
    d_up = lax.dot_general(
        dy, h, (((0,), (0,)), ((), ())),
        precision=lax.Precision.HIGHEST, preferred_element_type=dt,
    )  # (N, r)
    # scale = alpha/rank is frozen (split_peft_params never trains alpha,
    # matching the reference's requires_grad=False) — its cotangent, like
    # the base weight's, is a dead zero that XLA DCEs
    return dx, jnp.zeros_like(w), d_down, d_up, jnp.zeros_like(scale)


_lora_concat_dot.defvjp(_lora_concat_fwd, _lora_concat_bwd)


def _conv_adapter_delta(
    params: Params, x: jax.Array, stride: int, padding: int
) -> jax.Array | None:
    """LoRA delta for a Conv2d (kohya conv-LoRA layout: down = same-geometry
    conv to rank channels, up = 1x1 conv; reference lora.py:167-255)."""
    if not _PEFT_ENABLED[0] or "lora_down" not in params:
        return None
    down_w = params["lora_down"]["weight"].astype(x.dtype)
    up_w = params["lora_up"]["weight"].astype(x.dtype)
    rank = down_w.shape[0]
    scale = (params["alpha"].astype(jnp.float32) / rank).astype(x.dtype)
    h = lax.conv_general_dilated(
        x,
        down_w,
        window_strides=(stride, stride),
        padding=[(padding, padding)] * 2,
        dimension_numbers=("NHWC", "OIHW", "NHWC"),
        precision=lax.Precision.HIGHEST,
    )
    h = lax.conv_general_dilated(
        h,
        up_w,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "OIHW", "NHWC"),
        precision=lax.Precision.HIGHEST,
    )
    if "bias" in params["lora_up"]:
        h = h + params["lora_up"]["bias"].astype(x.dtype)
    return h * scale


class Linear(Module):
    def __init__(self, in_features: int, out_features: int, bias: bool = True):
        self.in_features = in_features
        self.out_features = out_features
        self.use_bias = bias

    def init(self, key, dtype=jnp.float32) -> Params:
        # torch nn.Linear default: kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(in), 1/sqrt(in))
        bound = 1.0 / math.sqrt(self.in_features)
        wkey, bkey = jax.random.split(key)
        params: Params = {
            "weight": jax.random.uniform(
                wkey, (self.out_features, self.in_features), dtype, -bound, bound
            )
        }
        if self.use_bias:
            params["bias"] = jax.random.uniform(bkey, (self.out_features,), dtype, -bound, bound)
        return params

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        w = params["weight"]
        if isinstance(w, dict) and "w8a8" in w:
            # int8_w8a8 (modules/quant): compute IN int8 — dynamic
            # per-token symmetric activation quant, s8 x s8 -> s32 dot on
            # the MXU's int8 path (~2x bf16 peak on v5e+), fp rescale
            # epilogue. Weight scale is per output channel, (O, 1).
            xf = x.astype(jnp.float32)
            amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
            x_scale = jnp.maximum(amax, 1e-8) / 127.0
            x_q = jnp.clip(jnp.round(xf / x_scale), -127, 127).astype(jnp.int8)
            y = lax.dot_general(
                x_q,
                w["data"],
                (((x.ndim - 1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            y = (y.astype(jnp.float32) * (x_scale * w["scale"][:, 0])).astype(
                x.dtype
            )
        else:
            if (
                isinstance(w, dict)
                and "packed" in w
                and "split" in w
                and os.environ.get("VFT_NF4_STREAM", "0") == "1"
            ):
                # panel-streamed XLA dequant (ops/nf4_stream): dequant
                # each weight element ONCE (the fused kernel re-dequants
                # per M block) while only one (bn, k) bf16 panel is ever
                # live — A/B lever against the fused default
                from ..modules.quant.nf4 import infer_blocksize
                from ..ops import nf4_stream

                n, k = self.out_features, self.in_features
                blocksize = infer_blocksize(n * k, w["absmax"].shape[0])
                if nf4_stream.supports(n, k, blocksize):
                    y = nf4_stream.nf4_stream_matmul(
                        x, w["packed"], w["code"], w["absmax"], (n, k),
                        blocksize,
                    )
                    if "bias" in params:
                        y = y + params["bias"].astype(y.dtype)
                    delta = _linear_adapter_delta(params, x)
                    if delta is not None:
                        y = y + delta
                    return y
            if (
                isinstance(w, dict)
                and "packed" in w
                and jax.default_backend() == "tpu"
                and os.environ.get("VFT_NF4_FUSED", "1") != "0"
            ):
                # bnb 4-bit: the fused Pallas matmul keeps the weight
                # packed in HBM and dequantizes tiles in VMEM — the XLA
                # dequant below must materialize the full weight plus an
                # f32 unpack stack as HBM temps per matmul (enough live
                # temps to OOM the SDXL/AuraFlow NF4 train steps)
                from ..modules.quant.nf4 import infer_blocksize
                from ..ops.pallas.nf4_matmul import nf4_matmul, supports

                n, k = self.out_features, self.in_features
                numel = n * k
                blocksize = infer_blocksize(numel, w["absmax"].shape[0])
                m = x.size // x.shape[-1]
                if supports(m, k, n, blocksize):
                    y = nf4_matmul(x, w["packed"], w["code"], w["absmax"], (n, k),
                                   blocksize, split="split" in w)
                    if "bias" in params:
                        y = y + params["bias"].astype(y.dtype)
                    delta = _linear_adapter_delta(params, x)
                    if delta is not None:
                        y = y + delta
                    return y
            if isinstance(w, dict) or w.dtype in (jnp.float8_e4m3fn, jnp.float8_e5m2):
                # quantized weight subtree (modules/quant): dequantize on
                # the fly; XLA fuses the gather+scale into this matmul
                from ..modules.quant.functional import dequantize_weight

                w = dequantize_weight(
                    w, dtype=x.dtype, shape=(self.out_features, self.in_features)
                )
            if (
                _PEFT_ENABLED[0]
                and isinstance(params.get("lora_down"), dict)
                and "bias" not in params.get("lora_up", {})
                and os.environ.get("VFT_LORA_CONCAT", "0") == "1"
            ):
                # rank-r LoRA folded into the base matmul (one dot, one
                # output write) — see _lora_concat_dot. DEFAULT OFF: the
                # r4 on-chip A/B measured the separate-delta path faster
                # on SDXL (756.8 vs 830.2 ms/step) and the concat's
                # weight/activation copies OOMing the Lumina2 b4 step —
                # the lever stays for shapes where it may win
                down_w = params["lora_down"]["weight"]
                up_w = params["lora_up"]["weight"]
                rank = down_w.shape[0]
                scale = (params["alpha"].astype(jnp.float32) / rank).astype(x.dtype)
                lead = x.shape[:-1]
                # the custom VJP trains ONLY down/up (dW and dscale are
                # symbolic zeros — the frozen-base assumption). Sever w
                # and scale structurally so a caller differentiating the
                # base weight through this path gets an explicitly
                # stopped gradient, not a silently wrong zero.
                y = _lora_concat_dot(
                    x.reshape(-1, self.in_features), lax.stop_gradient(w),
                    down_w, up_w, lax.stop_gradient(scale)
                ).reshape(*lead, self.out_features)
                if "bias" in params:
                    y = y + params["bias"].astype(y.dtype)
                return y
            y = lax.dot_general(
                x,
                w,
                (((x.ndim - 1,), (1,)), ((), ())),
                precision=lax.Precision.HIGHEST,
                preferred_element_type=x.dtype,
            )
        if "bias" in params:
            y = y + params["bias"].astype(y.dtype)
        delta = _linear_adapter_delta(params, x)
        if delta is not None:
            y = y + delta
        return y


class Conv2d(Module):
    """2-D convolution over NHWC activations with OIHW-stored kernels."""

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        kernel_size: int = 3,
        stride: int = 1,
        padding: int = 0,
        bias: bool = True,
    ):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = kernel_size
        self.stride = stride
        self.padding = padding
        self.use_bias = bias

    def init(self, key, dtype=jnp.float32) -> Params:
        fan_in = self.in_channels * self.kernel_size * self.kernel_size
        bound = 1.0 / math.sqrt(fan_in)
        wkey, bkey = jax.random.split(key)
        params: Params = {
            "weight": jax.random.uniform(
                wkey,
                (self.out_channels, self.in_channels, self.kernel_size, self.kernel_size),
                dtype,
                -bound,
                bound,
            )
        }
        if self.use_bias:
            params["bias"] = jax.random.uniform(bkey, (self.out_channels,), dtype, -bound, bound)
        return params

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        w = params["weight"].astype(x.dtype)
        # bf16 fast paths: keep every conv a plain channel contraction so
        # the whole graph stays C-minor — lax.conv's TPU lowering prefers
        # its own (W-minor) layout and radiates 40MB relayout copies into
        # neighboring fusions (profiled on v5e: GroupNorm stats fusions
        # ballooned 0.05 -> 0.45 ms absorbing the transposes). fp32 keeps
        # lax.conv for exact golden parity. A fused Pallas 3x3 variant
        # exists (ops/pallas/conv3x3.py) but measured slower end-to-end.
        # the tap path re-reads the input 9x; past ~128^2 spatial rows it
        # goes HBM-bound and lax.conv's halo reuse wins 2-2.5x (VAE shapes:
        # 512^2x256 taps 8.3 ms vs conv 4.1; 1024^2x128 taps 16.6 vs 6.6)
        compute_bound = x.shape[1] * x.shape[2] <= 128 * 128
        fast = x.dtype == jnp.bfloat16 and self.in_channels >= 128
        if fast and self.kernel_size == 1 and self.padding == 0:
            # 1x1 conv == matmul over channels (any stride via slicing)
            xs = x[:, :: self.stride, :: self.stride, :] if self.stride > 1 else x
            y = jnp.einsum(
                "bhwc,co->bhwo", xs, jnp.transpose(w[:, :, 0, 0]),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
        elif (
            fast
            and compute_bound
            and self.kernel_size == 3
            and self.stride in (1, 2)
            and self.padding == 1
        ):
            # nine shifted matmuls: measured 10-37% faster than lax.conv on
            # v5e at SDXL channel counts, and layout-clean (see above)
            y = self._conv3x3_as_matmuls(x, w, self.stride)
        else:
            y = lax.conv_general_dilated(
                x,
                w,
                window_strides=(self.stride, self.stride),
                padding=[(self.padding, self.padding)] * 2,
                dimension_numbers=("NHWC", "OIHW", "NHWC"),
                precision=lax.Precision.HIGHEST,
            )
        if "bias" in params:
            y = y + params["bias"].astype(y.dtype)
        delta = _conv_adapter_delta(params, x, self.stride, self.padding)
        if delta is not None:
            y = y + delta
        return y

    @staticmethod
    def _conv3x3_as_matmuls(x: jax.Array, w: jax.Array, stride: int = 1) -> jax.Array:
        b, hh, ww, c = x.shape
        whwio = jnp.transpose(w, (2, 3, 1, 0))  # (kh, kw, in, out)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        ho = (hh + 2 - 3) // stride + 1
        wo = (ww + 2 - 3) // stride + 1
        out = None
        for dy in range(3):
            for dx in range(3):
                patch = xp[
                    :,
                    dy : dy + (ho - 1) * stride + 1 : stride,
                    dx : dx + (wo - 1) * stride + 1 : stride,
                    :,
                ]
                term = jnp.einsum(
                    "bhwc,co->bhwo", patch, whwio[dy, dx],
                    preferred_element_type=jnp.float32,
                )
                out = term if out is None else out + term
        return out.astype(x.dtype)


class LayerNorm(Module):
    """LayerNorm with fp32 compute island (matches reference FP32LayerNorm,
    /root/reference/src/modules/norm.py:9 and plain nn.LayerNorm)."""

    def __init__(self, dim: int, eps: float = 1e-5, elementwise_affine: bool = True, bias: bool = True):
        self.dim = dim
        self.eps = eps
        self.elementwise_affine = elementwise_affine
        self.use_bias = bias and elementwise_affine

    def init(self, key, dtype=jnp.float32) -> Params:
        if not self.elementwise_affine:
            return {}
        params: Params = {"weight": jnp.ones((self.dim,), dtype)}
        if self.use_bias:
            params["bias"] = jnp.zeros((self.dim,), dtype)
        return params

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        if (
            x.dtype == jnp.bfloat16
            and "weight" in params
            and self.dim % 128 == 0
            and x.ndim >= 2
            and jax.default_backend() == "tpu"
        ):
            # fused Pallas LN: one VMEM pass instead of XLA's
            # convert+reduce / normalize fusion pair (~20ms/step saved
            # across an SDXL UNet's ~210 LayerNorms on v5e)
            from ..ops.pallas.layer_norm import layer_norm_tpu

            return layer_norm_tpu(
                x, params["weight"], params.get("bias"), self.eps
            )
        orig_dtype = x.dtype
        h = x.astype(jnp.float32)
        mean = jnp.mean(h, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(h - mean), axis=-1, keepdims=True)
        h = (h - mean) * lax.rsqrt(var + self.eps)
        if "weight" in params:
            h = h * params["weight"].astype(jnp.float32)
        if "bias" in params:
            h = h + params["bias"].astype(jnp.float32)
        return h.astype(orig_dtype)


class RMSNorm(Module):
    """RMSNorm with fp32 compute (reference FP32RMSNorm, src/modules/norm.py:20)."""

    def __init__(self, dim: int, eps: float = 1e-6, elementwise_affine: bool = True):
        self.dim = dim
        self.eps = eps
        self.elementwise_affine = elementwise_affine

    def init(self, key, dtype=jnp.float32) -> Params:
        if not self.elementwise_affine:
            return {}
        return {"weight": jnp.ones((self.dim,), dtype)}

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        orig_dtype = x.dtype
        h = x.astype(jnp.float32)
        h = h * lax.rsqrt(jnp.mean(jnp.square(h), axis=-1, keepdims=True) + self.eps)
        if "weight" in params:
            h = h * params["weight"].astype(jnp.float32)
        return h.astype(orig_dtype)


class GroupNorm(Module):
    """GroupNorm over NHWC activations, fp32 compute."""

    def __init__(self, num_groups: int, num_channels: int, eps: float = 1e-5, affine: bool = True):
        assert num_channels % num_groups == 0
        self.num_groups = num_groups
        self.num_channels = num_channels
        self.eps = eps
        self.affine = affine

    def init(self, key, dtype=jnp.float32) -> Params:
        if not self.affine:
            return {}
        return {
            "weight": jnp.ones((self.num_channels,), dtype),
            "bias": jnp.zeros((self.num_channels,), dtype),
        }

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        # x: (..., H, W, C) — stats over all spatial dims and the channels
        # within a group. Reductions run over the SPATIAL axes with C on
        # the TPU lane dimension; reshaping to (..., g, c//g) first would
        # put c//g (often ~10) on the lanes and waste >90% of the VPU
        # (measured: 26ms -> ~6ms of GroupNorm stats per SDXL UNet step).
        orig_dtype = x.dtype
        *lead, c = x.shape
        g = self.num_groups
        b = x.shape[0]
        hf = x.astype(jnp.float32).reshape(b, -1, c)
        spatial = hf.shape[1]
        # two-pass per-channel stats, then combine within groups
        sum_c = jnp.sum(hf, axis=1)  # (B, C)
        mean_g = jnp.mean(sum_c.reshape(b, g, c // g), axis=-1) / spatial  # (B, g)
        mean_c = jnp.repeat(mean_g, c // g, axis=-1)  # (B, C), group mean per channel
        sqdiff_c = jnp.sum(jnp.square(hf - mean_c[:, None, :]), axis=1)  # (B, C)
        var_g = jnp.mean(sqdiff_c.reshape(b, g, c // g), axis=-1) / spatial
        var_c = jnp.repeat(var_g, c // g, axis=-1)  # (B, C)
        h = (hf - mean_c[:, None, :]) * lax.rsqrt(var_c + self.eps)[:, None, :]
        h = h.reshape(x.shape)
        if "weight" in params:
            h = h * params["weight"].astype(jnp.float32)
            h = h + params["bias"].astype(jnp.float32)
        return h.astype(orig_dtype)


class ModuleDict(Module):
    """Composite module: children keyed by name (or stringified index).

    Param tree = {name: child_params}, with empty children (e.g. Identity)
    omitted so flattened keys exactly match a torch state dict (torch
    registers no entries for parameterless modules).
    """

    def __init__(self, children: dict[str, "Module"]):
        self.children = dict(children)

    def __getitem__(self, name) -> "Module":
        return self.children[str(name)]

    def init(self, key, dtype=jnp.float32) -> Params:
        names = list(self.children)
        keys = jax.random.split(key, max(len(names), 1))
        out: Params = {}
        for name, k in zip(names, keys):
            p = self.children[name].init(k, dtype)
            if p:
                out[name] = p
        return out


class Embedding(Module):
    def __init__(self, num_embeddings: int, embedding_dim: int):
        self.num_embeddings = num_embeddings
        self.embedding_dim = embedding_dim

    def init(self, key, dtype=jnp.float32) -> Params:
        return {
            "weight": jax.random.normal(key, (self.num_embeddings, self.embedding_dim), dtype)
        }

    def __call__(self, params: Params, ids: jax.Array) -> jax.Array:
        return jnp.take(params["weight"], ids, axis=0)
