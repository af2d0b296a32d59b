"""Probe: does this TPU/Mosaic build support grid blocks that do NOT
divide the array (partial final block, masked loads/stores)?

If yes, the flash wrappers can drop the q-side jnp.pad + output row
slice entirely (phase B of the r4 pad-elimination; phase A removed the
k/v pads and the v_aug copy). Run on the chip:

    python tools/bench/partial_block_probe.py

Prints one JSON line {"partial_blocks": true/false, ...}.
"""

from __future__ import annotations

import functools
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _kernel(x_ref, o_ref):
    # exact copy: value-transform probes mislead in bf16 (the first r4
    # run "failed" bf16 cases purely on x*2+1 rounding vs an f32 oracle)
    o_ref[...] = x_ref[...]


def _lastaxis_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...] * 2.0 + 1.0


def _case(x, block_rows, dtype_name):
    s, c = x.shape
    grid = ((s + block_rows - 1) // block_rows,)
    try:
        y = pl.pallas_call(
            _kernel,
            grid=grid,
            in_specs=[pl.BlockSpec((block_rows, c), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((block_rows, c), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((s, c), x.dtype),
        )(x)
        ok = bool(
            (np.asarray(y, np.float32) == np.asarray(x, np.float32)).all()
        )
        err = None
    except Exception as exc:  # lowering or runtime rejection
        ok, err = False, f"{type(exc).__name__}: {exc}"[:160]
    return {"dtype": dtype_name, "shape": [s, c], "block_rows": block_rows,
            "ok": ok, "error": err}


def _case_lastaxis(s, block_cols):
    """Partial block on the LAST (lane) axis — the lse (b*h, 8, sq)
    output layout when sq % block_q != 0."""
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((8, s)), jnp.float32
    )
    grid = ((s + block_cols - 1) // block_cols,)
    try:
        y = pl.pallas_call(
            _lastaxis_kernel,
            grid=grid,
            in_specs=[pl.BlockSpec((8, block_cols), lambda i: (0, i))],
            out_specs=pl.BlockSpec((8, block_cols), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct((8, s), jnp.float32),
        )(x)
        ok = bool(jnp.allclose(y, x * 2.0 + 1.0, atol=1e-6))
        err = None
    except Exception as exc:
        ok, err = False, f"{type(exc).__name__}: {exc}"[:160]
    return {"dtype": "f32-lastaxis", "shape": [8, s], "block_cols": block_cols,
            "ok": ok, "error": err}


def main() -> None:
    rng = np.random.default_rng(0)
    cases = [
        # f32, remainder 264 (8-aligned): the Lumina2-style q axis
        _case(jnp.asarray(rng.standard_normal((4360, 256)), jnp.float32),
              512, "f32"),
        # bf16, remainder 264 (8-aligned, NOT 16-aligned): AuraFlow S=4360
        _case(jnp.asarray(rng.standard_normal((4360, 256)), jnp.bfloat16),
              512, "bf16"),
        # bf16, odd remainder (element-granular masking required)
        _case(jnp.asarray(rng.standard_normal((1219, 256)), jnp.bfloat16),
              512, "bf16-odd"),
        _case_lastaxis(4352, 512),
    ]
    print(json.dumps({"partial_blocks": all(c["ok"] for c in cases),
                      "cases": cases}))


if __name__ == "__main__":
    main()
