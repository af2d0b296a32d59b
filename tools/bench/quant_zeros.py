"""Synthesize a packed bnb-NF4 param tree of ZEROS directly from shapes.

Benchmark-only: quantizing a zeros tree through the real packer computes
nothing useful (absmax = 0, every code index identical) but costs
minutes of host/tunnel time at multi-billion-param scale. The timing of
the fused dequant-matmul path is value-independent, so the benches build
the quantized layout straight from the abstract shapes: packed uint8
zeros + unit absmax + the NF4 codebook + the same _meta payload
vision_ft_tpu.modules.quant.functional.quantize_weight emits.
"""

from __future__ import annotations

import numpy as np


def quantize_params_zeros(abstract_tree, include_keys, blocksize: int = 64):
    """abstract (ShapeDtypeStruct) tree -> host-numpy param tree where
    every 2-D ``<key>.weight`` matching include_keys becomes the bnb-NF4
    packed subtree and everything else becomes numpy zeros."""
    from vision_ft_tpu.modules.quant.functional import _encode_meta
    from vision_ft_tpu.modules.quant.nf4 import NF4_CODE
    from vision_ft_tpu.nn import flatten_params, unflatten_params

    flat = dict(flatten_params(abstract_tree))
    out = {}
    for key, leaf in flat.items():
        targeted = (
            key.endswith(".weight")
            and len(leaf.shape) == 2
            and any(t in key for t in include_keys)
        )
        if targeted:
            numel = int(np.prod(leaf.shape))
            if leaf.shape[1] % 2 == 0:
                # mirror quantize_weight's split device layout exactly,
                # INCLUDING its 2-D (n, k//2) shape: a 1-column packed
                # array forces an in-graph reshape/retile copy of every
                # weight per step (seen as u8[n, k/2] HLO temps in the
                # AuraFlow b1 OOM dump). Zeros are layout-invariant; the
                # MARKER routes the kernel onto the contiguous-slice path.
                n, k = leaf.shape
                out[f"{key}.packed"] = np.zeros((n, k // 2), np.uint8)
                out[f"{key}.split"] = np.ones((), np.uint8)
            else:
                out[f"{key}.packed"] = np.zeros(((numel + 1) // 2, 1), np.uint8)
            out[f"{key}.code"] = np.asarray(NF4_CODE, np.float32)
            out[f"{key}.absmax"] = np.ones(
                (numel + blocksize - 1) // blocksize, np.float32
            )
            out[f"{key}._meta"] = np.asarray(
                _encode_meta("nf4", leaf.shape, blocksize)
            )
        else:
            out[key] = np.zeros(leaf.shape, leaf.dtype)
    return unflatten_params(out)
