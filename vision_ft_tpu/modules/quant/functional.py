"""Quantization as param-tree transformations.

Reference surface: /root/reference/src/modules/quant/functional.py
(QUANT_TYPE dispatcher, replace/inplace quantization, prequantized
checkpoint detection + loading, offline quantize_state_dict). TPU-native
delta: a quantized Linear is a *param subtree* — ``params["weight"]``
becomes a dict {"packed"/"data", scales, ...} — and ``nn.core.Linear``
dequantizes on the fly (the dequant fuses into the matmul under jit;
QLoRA = this + LoRA subtrees side by side).

Supported types (reference functional.py:21-30):
  bnb_nf4 / bnb_fp4  — bnb-packed 4-bit (bit-compatible load & save)
  ao_nf4             — same math as bnb_nf4 (torchao's layout is runtime-
                       only in the reference too)
  bnb_int8           — per-row absmax int8 (LLM.int8 weight format)
  quanto_int8        — quanto qint8 (weight._data x weight._scale)
  quanto_int4        — quanto QBitsTensor affine uint4 (row-pair nibble
                       packing, dq = q*scale - shift)
  fp8_e4m3fn / ao_fp8— native XLA fp8 dtype cast

TPU-only addition (no reference counterpart — bnb/quanto are CUDA):
  int8_w8a8          — W8A8 compute-in-int8: per-output-channel symmetric
                       int8 weights + dynamic per-token int8 activations,
                       s8 x s8 -> s32 ``lax.dot_general`` that XLA lowers
                       onto the MXU's int8 path (~2x bf16 peak on v5e+),
                       fp rescale epilogue. Every other type here
                       dequantizes INTO a bf16 matmul and saves only
                       memory; this one doubles the matmul rate too.
                       Inference-path quantization (round has no gradient).
"""

from __future__ import annotations

import logging
from typing import Any, Literal, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ...nn.core import Params, flatten_params, unflatten_params
from ...utils.state_dict import RegexMatch, get_target_keys
from .nf4 import dequantize_4bit, infer_blocksize, parse_quant_state, quantize_4bit

QUANT_TYPE = Literal[
    "fp8_e4m3fn",
    "bnb_int8",
    "bnb_fp4",
    "bnb_nf4",
    "quanto_int4",
    "quanto_int8",
    "ao_nf4",
    "ao_fp8",
    "int8_w8a8",
]

logger = logging.getLogger(__name__)

_ALL_TYPES = (
    "fp8_e4m3fn", "bnb_int8", "bnb_fp4", "bnb_nf4",
    "quanto_int4", "quanto_int8", "ao_nf4", "ao_fp8",
    "int8_w8a8",
)


def validate_quant_type(quant_type: str) -> None:
    if quant_type not in _ALL_TYPES:
        raise ValueError(f"Unknown quant_type: {quant_type}")


# ---------------------------------------------------------------------------
# quantized-weight subtree construction / application


def quantize_weight(weight, quant_type: QUANT_TYPE) -> Any:
    """fp array -> quantized leaf (dict subtree or fp8 array)."""
    validate_quant_type(quant_type)
    w = np.asarray(weight, np.float32)
    if quant_type in ("bnb_nf4", "bnb_fp4", "ao_nf4"):
        qt = "nf4" if quant_type.endswith("nf4") else "fp4"
        packed, state = quantize_4bit(w, quant_type=qt)
        parsed = parse_quant_state(state)
        sub = {
            "code": parsed["code"],
            "absmax": parsed["absmax"],
            "_meta": _encode_meta(qt, w.shape, parsed["blocksize"]),
        }
        sub.update(_device_packed_layout(packed, w.shape))
        return sub
    if quant_type == "bnb_int8":
        absmax = np.maximum(np.abs(w).max(axis=1), 1e-12).astype(np.float32)
        data = np.round(w / absmax[:, None] * 127.0).clip(-127, 127).astype(np.int8)
        return {"data": jnp.asarray(data), "SCB": jnp.asarray(absmax)}
    if quant_type == "quanto_int8":
        scale = np.maximum(np.abs(w).max(axis=1, keepdims=True), 1e-12).astype(np.float32) / 127.0
        data = np.round(w / scale).clip(-127, 127).astype(np.int8)
        return {"data": jnp.asarray(data), "scale": jnp.asarray(scale)}
    if quant_type == "int8_w8a8":
        # same per-output-channel symmetric storage as quanto_int8; the
        # "w8a8" marker routes nn.core.Linear onto the compute-in-int8
        # path instead of dequantize-into-bf16-matmul
        scale = np.maximum(np.abs(w).max(axis=1, keepdims=True), 1e-12).astype(np.float32) / 127.0
        data = np.round(w / scale).clip(-127, 127).astype(np.int8)
        return {
            "data": jnp.asarray(data),
            "scale": jnp.asarray(scale),
            "w8a8": jnp.ones((), jnp.int8),
        }
    if quant_type == "quanto_int4":
        # affine per-output-channel uint4 in optimum-quanto's QBitsTensor
        # layout: shift = -rmin in weight units, q = round((w+shift)/scale)
        # in [0,15], dq = q*scale - shift. PackedTensor packs CONTIGUOUS
        # row halves (pack_weights iterates `start = i * row_dim`): rows
        # [0, R/2) in the low nibble, rows [R/2, R) in the high nibble.
        assert w.ndim == 2 and w.shape[0] % 2 == 0, "int4 needs even out_features"
        rmin = w.min(axis=1, keepdims=True)
        rmax = w.max(axis=1, keepdims=True)
        scale = np.maximum((rmax - rmin) / 15.0, 1e-12).astype(np.float32)
        shift = (-rmin).astype(np.float32)
        q = np.round((w + shift) / scale).clip(0, 15).astype(np.uint8)
        half = w.shape[0] // 2
        packed = (q[:half] | (q[half:] << 4)).astype(np.uint8)
        return {
            "data": jnp.asarray(packed),
            "scale": jnp.asarray(scale),
            "shift": jnp.asarray(shift),
        }
    if quant_type in ("fp8_e4m3fn", "ao_fp8"):
        return jnp.asarray(w).astype(jnp.float8_e4m3fn)
    raise NotImplementedError(f"{quant_type} quantization is not implemented")


def _device_packed_layout(packed, shape) -> dict[str, Any]:
    """bnb disk bytes -> the device-tree packed layout.

    2-D even-k weights repack to the SPLIT layout (hi nibbles = columns
    [0, k/2), lo = [k/2, k)), marked by a ``split`` leaf: the fused
    Pallas matmul then reads both nibble-plane activations as contiguous
    slices of x — the bnb byte order would force a stride-2 lane
    deinterleave of x per call, an extra XLA pass whose gather fusion
    overflows the 16 MB scoped-VMEM stack at AuraFlow train shapes.
    One-time host-side numpy; the on-disk format stays bnb
    (quantize_state_dict / the quant goldens are unaffected).
    """
    if len(shape) == 2 and shape[1] % 2 == 0:
        from ...ops.pallas.nf4_matmul import to_split_layout

        return {
            "packed": jnp.asarray(
                to_split_layout(np.asarray(packed, np.uint8), tuple(shape))
            ),
            "split": jnp.ones((), jnp.uint8),
        }
    return {"packed": jnp.asarray(packed)}


def _encode_meta(quant_type: str, shape, blocksize: int) -> jax.Array:
    import json

    payload = json.dumps(
        {"quant_type": quant_type, "shape": list(shape), "blocksize": blocksize}
    ).encode("utf-8")
    return jnp.asarray(np.frombuffer(payload, np.uint8).copy())


def _decode_meta(meta: jax.Array) -> dict:
    import json

    return json.loads(bytes(np.asarray(meta).astype(np.uint8)).decode("utf-8"))


def is_quantized_weight(weight: Any) -> bool:
    if isinstance(weight, dict):
        return True
    dtype = getattr(weight, "dtype", None)
    return dtype in (jnp.float8_e4m3fn, jnp.float8_e5m2)


def dequantize_weight(weight: Any, dtype=jnp.float32, shape=None) -> jax.Array:
    """Quantized leaf -> fp array.

    ``shape`` (static) must be passed under jit for 4-bit subtrees — the
    ``_meta`` leaf is host-only (decoding it would read a tracer). Linear
    passes its own (out_features, in_features).
    """
    if not isinstance(weight, dict):
        return weight.astype(dtype)  # fp8 array
    if "packed" in weight:
        if shape is None:
            meta = _decode_meta(weight["_meta"])
            shape = tuple(meta["shape"])
        numel = int(np.prod(shape))
        blocksize = infer_blocksize(numel, int(weight["absmax"].shape[0]))
        return dequantize_4bit(
            weight["packed"], weight["code"], weight["absmax"],
            tuple(shape), blocksize, dtype, split="split" in weight,
        )
    if "SCB" in weight:
        return (
            weight["data"].astype(jnp.float32) * weight["SCB"][:, None] / 127.0
        ).astype(dtype)
    if "shift" in weight:
        # quanto qint4: contiguous-half nibbles (rows [0,R/2) low, [R/2,R)
        # high — quanto pack_weights), dq = q*scale - shift (gather-free).
        # Two QBitsTensor layouts exist (optimum-quanto grouped.py):
        #   ungrouped: rows are output channels, scale/shift (out, 1)
        #   grouped (the qint4 default, group_size<=128): the weight was
        #     reshaped row-major to (numel/gs, gs) before quantization, so
        #     scale/shift are per-group rows and dq must be reshaped back
        #     to the logical (out, in) — which quanto's `group(axis=0)` is
        #     a plain row-major reshape, so one reshape undoes it.
        packed = weight["data"]
        lo = (packed & 0xF).astype(jnp.float32)
        hi = (packed >> 4).astype(jnp.float32)
        q = jnp.concatenate([lo, hi], axis=0)
        dq = q * weight["scale"].astype(jnp.float32) - weight["shift"].astype(jnp.float32)
        if shape is not None and tuple(dq.shape) != tuple(shape):
            if dq.size != int(np.prod(shape)):
                raise ValueError(
                    f"quanto int4 subtree of {dq.shape} cannot reshape to "
                    f"weight shape {tuple(shape)} — unsupported QBitsTensor layout"
                )
            dq = dq.reshape(tuple(shape))
        return dq.astype(dtype)
    if "scale" in weight:
        return (weight["data"].astype(jnp.float32) * weight["scale"]).astype(dtype)
    raise ValueError(f"Unknown quantized weight layout: {list(weight)}")


# ---------------------------------------------------------------------------
# param-tree transformations (replace / inplace are one operation here)


def quantize_params(
    params: Params,
    quant_type: QUANT_TYPE,
    include_keys: Sequence[str | RegexMatch],
    exclude_keys: Sequence[str | RegexMatch] = (),
) -> Params:
    """Quantize targeted 2-D (Linear) weights in a param tree."""
    flat = dict(flatten_params(params))
    paths = [
        k[: -len(".weight")]
        for k, v in flat.items()
        if k.endswith(".weight") and getattr(v, "ndim", 0) == 2
    ]
    targets = set(get_target_keys(include_keys, exclude_keys, paths))
    out: dict[str, Any] = {}
    for key, value in flat.items():
        root = key[: -len(".weight")] if key.endswith(".weight") else None
        if root in targets:
            q = quantize_weight(value, quant_type)
            if isinstance(q, dict):
                for name, leaf in q.items():
                    out[f"{key}.{name}"] = leaf
            else:
                out[key] = q
        else:
            out[key] = value
    return unflatten_params(out)


# keep the reference API names
replace_to_quant_linear = quantize_params
quantize_inplace = quantize_params


# ---------------------------------------------------------------------------
# prequantized checkpoints


def collect_children_dict(
    prefix: str, state_dict: dict[str, Any], remove_prefix: bool = True
) -> dict[str, Any]:
    return {
        (k[len(prefix):] if remove_prefix else k): v
        for k, v in state_dict.items()
        if k.startswith(prefix)
    }


def get_quant_type_from_children_dict(children: dict[str, Any]) -> QUANT_TYPE:
    """(reference functional.py:277-301)"""
    for key, tensor in children.items():
        if "quant_state" in key:
            qt = key[len("quant_state.bitsandbytes__"):]
            if qt == "nf4":
                return "bnb_nf4"
            if qt == "fp4":
                return "bnb_fp4"
        elif "weight_format" in key:
            return "bnb_int8"
        elif "w8a8" in key:
            return "int8_w8a8"
        elif "_data" in key:
            if tensor.dtype == jnp.int8:
                return "quanto_int8"
            return "quanto_int4"
    raise ValueError("quant_type not found")


def convert_prequantized_state_dict(state_dict: dict[str, Any]) -> dict[str, Any]:
    """Group bnb/quanto quant-state keys (``X.weight.absmax`` etc.) into the
    dict-valued ``X.weight`` subtrees our Linear applies — the functional
    analogue of replace_by_prequantized_weights (reference :303-338)."""
    roots = set()
    for key in state_dict:
        for marker in (".weight.quant_state.bitsandbytes__", ".weight.absmax",
                       ".weight._data", ".weight._shift", ".weight.SCB",
                       ".weight.w8a8"):
            idx = key.find(marker)
            if idx >= 0:
                roots.add(key[: idx + len(".weight")])
    if not roots:
        return state_dict

    out: dict[str, Any] = {}
    consumed: set[str] = set()
    for root in roots:
        children = collect_children_dict(f"{root}.", state_dict)
        consumed.update(f"{root}.{k}" for k in children)
        consumed.add(root)
        quant_type = get_quant_type_from_children_dict(children)
        if quant_type in ("bnb_nf4", "bnb_fp4"):
            parsed = parse_quant_state(children)
            for name, leaf in _device_packed_layout(
                np.asarray(state_dict[root]), parsed["shape"]
            ).items():
                out[f"{root}.{name}"] = leaf
            out[f"{root}.code"] = parsed["code"]
            out[f"{root}.absmax"] = parsed["absmax"]
            out[f"{root}._meta"] = _encode_meta(
                parsed["quant_type"], parsed["shape"], parsed["blocksize"]
            )
        elif quant_type == "bnb_int8":
            out[f"{root}.data"] = jnp.asarray(state_dict[root])
            out[f"{root}.SCB"] = jnp.asarray(children["SCB"])
        elif quant_type == "int8_w8a8":
            out[f"{root}.data"] = jnp.asarray(children["data"])
            out[f"{root}.scale"] = jnp.asarray(children["scale"])
            out[f"{root}.w8a8"] = jnp.asarray(children["w8a8"])
        elif quant_type == "quanto_int8":
            out[f"{root}.data"] = jnp.asarray(children["_data"])
            out[f"{root}.scale"] = jnp.asarray(children["_scale"])
        elif quant_type == "quanto_int4":
            out[f"{root}.data"] = jnp.asarray(np.asarray(children["_data"]), jnp.uint8)
            out[f"{root}.scale"] = jnp.asarray(children["_scale"])
            out[f"{root}.shift"] = jnp.asarray(children["_shift"])
        else:
            raise NotImplementedError(f"{quant_type} checkpoints are not supported yet")
    for key, value in state_dict.items():
        if key not in consumed:
            out[key] = value
    return out


def quantize_state_dict(
    state_dict: dict[str, Any],
    quant_type: QUANT_TYPE,
    include_keys: Sequence[str | RegexMatch],
    exclude_keys: Sequence[str | RegexMatch] = (),
) -> dict[str, Any]:
    """Offline checkpoint quantizer in bnb's on-disk format
    (reference functional.py:342-371 + tools/quantize_model.py)."""
    if quant_type not in ("bnb_nf4", "bnb_fp4", "fp8_e4m3fn", "quanto_int4",
                          "int8_w8a8"):
        raise NotImplementedError(
            "Only bnb 4bit / fp8 / quanto int4 / int8_w8a8 offline "
            "quantization is supported"
        )
    targets = set(get_target_keys(include_keys, exclude_keys, list(state_dict.keys())))
    out = dict(state_dict)
    for key in list(out.keys()):
        if key not in targets:
            continue
        if quant_type in ("bnb_nf4", "bnb_fp4"):
            w = np.asarray(out[key], np.float32)
            if w.ndim != 2:
                logger.warning(
                    "quantize_state_dict: skipping %s (ndim=%d, only 2-D "
                    "weights are quantized) — it stays full precision", key, w.ndim
                )
                continue
            packed, state = quantize_4bit(
                w, quant_type=quant_type[len("bnb_"):], compress_statistics=True
            )
            out[key] = jnp.asarray(packed)
            for state_key, state_value in state.items():
                out[f"{key}.{state_key}"] = jnp.asarray(state_value)
        elif quant_type == "int8_w8a8":
            w = np.asarray(out[key], np.float32)
            if w.ndim != 2:
                logger.warning(
                    "quantize_state_dict: skipping %s (ndim=%d, only 2-D "
                    "weights are quantized) — it stays full precision",
                    key, w.ndim,
                )
                continue
            sub = quantize_weight(w, "int8_w8a8")
            del out[key]
            for name, leaf in sub.items():
                out[f"{key}.{name}"] = leaf
        elif quant_type == "quanto_int4":
            w = np.asarray(out[key], np.float32)
            if w.ndim != 2 or w.shape[0] % 2 != 0:
                logger.warning(
                    "quantize_state_dict: skipping %s (shape %s — quanto "
                    "int4 needs a 2-D weight with even out_features) — it "
                    "stays full precision", key, w.shape
                )
                continue
            sub = quantize_weight(w, "quanto_int4")
            del out[key]
            out[f"{key}._data"] = sub["data"]
            out[f"{key}._scale"] = sub["scale"]
            out[f"{key}._shift"] = sub["shift"]
        else:
            out[key] = jnp.asarray(out[key]).astype(jnp.float8_e4m3fn)
    return out
