"""dtype-name parsing (reference src/utils/dtype.py:1-15, jnp dtypes).

The reference raises ValueError on unknown names; same here. "float" is
accepted as an alias for float32 like the reference's str_to_dtype.
"""

from __future__ import annotations

import jax.numpy as jnp

_DTYPES = {
    "bfloat16": jnp.bfloat16,
    "bf16": jnp.bfloat16,
    "float16": jnp.float16,
    "fp16": jnp.float16,
    "float32": jnp.float32,
    "fp32": jnp.float32,
    "float": jnp.float32,
}


def str_to_dtype(dtype: str):
    try:
        return _DTYPES[dtype.lower()]
    except KeyError:
        raise ValueError(f"Unknown dtype: {dtype}") from None
