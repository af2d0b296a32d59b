"""PEFT transformations over param pytrees.

Reference behavior: /root/reference/src/modules/peft/functional.py.
Here every operation is a pure function over param dicts:

  replace_to_peft_layer  params -> params with adapter subtrees inserted
  get_adapter_parameters params -> flat kohya-layout adapter state dict
  split_peft_params      params -> (trainable adapter tree, frozen rest)
  merge_params           deep-merge trainable back into frozen for apply
  load_peft_weight       params + adapter safetensors -> params

Adapter leaf names (lora_down/lora_up/alpha, hada_w1_a..) and init rules
(kaiming-uniform down, zero up — lora.py:68-80; normal/zero — loha.py:86-95)
match the reference so exported files are interchangeable.
"""

from __future__ import annotations

import math
import warnings
from contextlib import contextmanager
from typing import Any, Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp

from ...utils.dtype import str_to_dtype as _str_to_dtype

from ...nn.core import (
    Params,
    flatten_params,
    set_peft_enabled,
    unflatten_params,
)
from ...utils.state_dict import RegexMatch, get_target_keys

ADAPTER_LEAF_NAMES = (
    "lora_down",
    "lora_up",
    "alpha",
    "hada_w1_a",
    "hada_w1_b",
    "hada_w2_a",
    "hada_w2_b",
)


def find_targetable_paths(params: Params) -> list[str]:
    """Module paths of Linear (2-D weight) / Conv2d (4-D weight) layers —
    the analogue of walking ``named_modules()`` for nn.Linear/Conv2d
    (reference functional.py:59-112)."""
    flat = flatten_params(params)
    paths = []
    for key, value in flat.items():
        if key.endswith(".weight") and getattr(value, "ndim", 0) in (2, 4):
            path = key[: -len(".weight")]
            leaf = path.split(".")[-1]
            if leaf in ("lora_down", "lora_up"):
                continue
            paths.append(path)
        elif key.endswith(".weight.packed") or key.endswith(".weight.data"):
            # quantized Linear (QLoRA base): the weight is a quant subtree
            paths.append(key[: -len(".weight.packed")] if key.endswith(".weight.packed")
                         else key[: -len(".weight.data")])
    return paths


def _quant_shape_stub(flat: dict, target: str):
    """Shape-only stand-in for a quantized base weight (QLoRA)."""
    import numpy as np

    from ..quant.functional import _decode_meta

    meta_key = f"{target}.weight._meta"
    if meta_key in flat:
        shape = tuple(_decode_meta(flat[meta_key])["shape"])
    elif f"{target}.weight.data" in flat:
        shape = tuple(flat[f"{target}.weight.data"].shape)
    else:
        raise KeyError(f"cannot infer shape of quantized weight at {target}")
    return jax.ShapeDtypeStruct(shape, jnp.float32)


def _get_subtree(params: Params, path: str) -> Params:
    node = params
    for part in path.split("."):
        node = node[part]
    return node


def _init_lora(
    key: jax.Array, weight: jax.Array, config, dtype
) -> Params:
    rank = config.rank
    if weight.ndim == 2:
        out_f, in_f = weight.shape
        down_shape = (rank, in_f)
        up_shape = (out_f, rank)
        fan_in = in_f
    else:  # conv OIHW
        out_f, in_f, kh, kw = weight.shape
        down_shape = (rank, in_f, kh, kw)
        up_shape = (out_f, rank, 1, 1)
        fan_in = in_f * kh * kw
    # torch kaiming_uniform_ (a=0, fan_in, gain sqrt(2)): U(+-sqrt(6/fan_in))
    bound = math.sqrt(6.0 / fan_in)
    adapter: Params = {
        "lora_down": {"weight": jax.random.uniform(key, down_shape, dtype, -bound, bound)},
        "lora_up": {"weight": jnp.zeros(up_shape, dtype)},
        "alpha": jnp.asarray(config.alpha, dtype),
    }
    if getattr(config, "use_bias", False):
        adapter["lora_up"]["bias"] = jnp.zeros((out_f,), dtype)
    return adapter


def _init_loha(key: jax.Array, weight: jax.Array, config, dtype) -> Params:
    assert weight.ndim == 2, "LoHa only supports Linear layers (reference loha.py)"
    out_f, in_f = weight.shape
    rank = config.rank
    k1, k2, k3 = jax.random.split(key, 3)
    # reference init (loha.py:86-95): w1_b ~ N(0,1), w1_a ~ N(0,0.1^2),
    # w2_b ~ N(0,1), w2_a = 0 (so the initial delta is zero)
    return {
        "hada_w1_a": jax.random.normal(k1, (in_f, rank), dtype) * 0.1,
        "hada_w1_b": jax.random.normal(k2, (rank, out_f), dtype),
        "hada_w2_a": jnp.zeros((in_f, rank), dtype),
        "hada_w2_b": jax.random.normal(k3, (rank, out_f), dtype),
        "alpha": jnp.asarray(config.alpha, dtype),
    }


def replace_to_peft_layer(
    params: Params,
    include_keys: Sequence[str | RegexMatch],
    exclude_keys: Sequence[str | RegexMatch],
    config,
    key: jax.Array,
    dtype=None,
) -> Params:
    """Insert zero-initialized adapter subtrees at every targeted
    Linear/Conv2d path. Returns a NEW params tree (inputs unchanged)."""
    dtype = dtype or _str_to_dtype(config.dtype)
    paths = find_targetable_paths(params)
    targets = sorted(get_target_keys(include_keys, exclude_keys, paths))
    if not targets:
        warnings.warn("PEFT targeting matched no layers — check include_keys")

    flat = dict(flatten_params(params))
    keys = jax.random.split(key, max(len(targets), 1))
    for target, sub_key in zip(targets, keys):
        weight = flat.get(f"{target}.weight")
        if weight is None:
            # quantized base: recover the fp shape for adapter sizing
            weight = _quant_shape_stub(flat, target)
        if config.type == "lora":
            adapter = _init_lora(sub_key, weight, config, dtype)
        elif config.type == "loha":
            if weight.ndim == 4:  # reference falls back to conv LoRA
                adapter = _init_lora(sub_key, weight, config, dtype)
            else:
                adapter = _init_loha(sub_key, weight, config, dtype)
        else:
            raise ValueError(f"Unknown peft type: {config.type}")
        for name, value in flatten_params(adapter).items():
            flat[f"{target}.{name}"] = value
    return unflatten_params(flat)


# -- collection / splitting --------------------------------------------------


def _is_adapter_key(key: str) -> bool:
    parts = key.split(".")
    return any(part in ADAPTER_LEAF_NAMES for part in parts)


def get_adapter_parameters(params: Params) -> dict[str, jax.Array]:
    """Flat kohya-layout adapter state dict (reference functional.py:114-128)."""
    return {k: v for k, v in flatten_params(params).items() if _is_adapter_key(k)}


def split_peft_params(params: Params) -> tuple[Params, Params]:
    """(trainable, frozen): adapter weights train, base + alpha stay frozen
    (alpha has requires_grad=False in the reference, lora.py:47-50)."""
    trainable_flat: dict[str, jax.Array] = {}
    frozen_flat: dict[str, jax.Array] = {}
    for key, value in flatten_params(params).items():
        if _is_adapter_key(key) and not key.endswith(".alpha"):
            trainable_flat[key] = value
        else:
            frozen_flat[key] = value
    return unflatten_params(trainable_flat), unflatten_params(frozen_flat)


def merge_params(frozen: Params, trainable: Params) -> Params:
    """Deep-merge (trainable wins) — rebuilds the full apply tree."""

    def merge(a: Params, b: Params) -> Params:
        out = dict(a)
        for name, value in b.items():
            if name in out and isinstance(out[name], dict) and isinstance(value, dict):
                out[name] = merge(out[name], value)
            else:
                out[name] = value
        return out

    return merge(frozen, trainable)


# -- loading -----------------------------------------------------------------


def detect_peft_method(state_dict: dict[str, Any]) -> str:
    if any(name.endswith(".lora_up.weight") for name in state_dict):
        return "lora"
    if any(".hada_w1_a" in name for name in state_dict):
        return "loha"
    return "none"


def load_peft_weight(params: Params, state_dict: dict[str, jax.Array]) -> Params:
    """Insert adapter weights from a flat adapter safetensors dict into the
    param tree (reference functional.py:229-276). Unknown paths are an
    error only if their base layer does not exist."""
    if detect_peft_method(state_dict) == "none":
        raise ValueError("Failed to detect peft method from state_dict")
    flat = dict(flatten_params(params))
    valid_roots = {p for p in find_targetable_paths(params)}
    for key, value in state_dict.items():
        root = key
        for leaf in ADAPTER_LEAF_NAMES:
            idx = key.find(f".{leaf}")
            if idx >= 0:
                root = key[:idx]
                break
        if root not in valid_roots:
            raise KeyError(f"adapter weight {key!r} has no base layer {root!r}")
        flat[key] = value
    return unflatten_params(flat)


# -- reporting ---------------------------------------------------------------


class TrainableParameters(NamedTuple):
    trainable_params: int
    all_param: int
    trainable_percent: float


def calculate_trainable_parameters(params: Params) -> TrainableParameters:
    trainable, frozen = split_peft_params(params)
    n_train = sum(int(x.size) for x in jax.tree.leaves(trainable))
    n_all = n_train + sum(int(x.size) for x in jax.tree.leaves(frozen))
    return TrainableParameters(n_train, n_all, 100.0 * n_train / max(n_all, 1))


def human_readable_param(param_size: int) -> str:
    for unit, value in (("T", 10**12), ("B", 10**9), ("M", 10**6), ("K", 10**3)):
        if param_size >= value:
            return f"{param_size / value:.2f}{unit}"
    return str(param_size)


def print_trainable_parameters(params: Params, print_fn: Callable = print) -> None:
    stats = calculate_trainable_parameters(params)
    print_fn(
        f"Trainable params: {human_readable_param(stats.trainable_params)}, "
        f"All params: {human_readable_param(stats.all_param)}, "
        f"Trainable%: {stats.trainable_percent:.4f}%"
    )
    if stats.trainable_params == 0:
        warnings.warn("No trainable parameters found — check your peft config")


# -- enable/disable ----------------------------------------------------------


@contextmanager
def while_peft_disabled():
    """Trace-time toggle: adapters are skipped for code traced inside this
    context (re-jit required for already-compiled callables)."""
    try:
        set_peft_enabled(False)
        yield
    finally:
        set_peft_enabled(True)


@contextmanager
def while_peft_enabled():
    try:
        set_peft_enabled(True)
        yield
    finally:
        set_peft_enabled(False)
