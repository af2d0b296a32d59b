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
    o_ref[...] = x_ref[...] * 2.0 + 1.0


def main() -> None:
    s, c, block = 4352 + 256, 256, 512  # 4608? no: 4608 divides; use 4360
    s = 4360  # AuraFlow's joint length: 4360 % 512 = 264, % 16 = 8
    x = jnp.asarray(np.random.default_rng(0).standard_normal((s, c)), jnp.float32)
    grid = ((s + block - 1) // block,)
    try:
        y = pl.pallas_call(
            _kernel,
            grid=grid,
            in_specs=[pl.BlockSpec((block, c), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((block, c), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((s, c), jnp.float32),
        )(x)
        ok = bool(jnp.allclose(y, x * 2.0 + 1.0, atol=1e-6))
        err = None
    except Exception as exc:  # lowering or runtime rejection
        ok, err = False, f"{type(exc).__name__}: {exc}"[:200]
    print(json.dumps({"partial_blocks": ok, "shape": [s, c], "block": block,
                      "error": err}))


if __name__ == "__main__":
    main()
