"""Checkpoint dtype converter (reference tools/checkpoint/ equivalents):
cast every floating tensor of a safetensors file to a target dtype."""

import os as _os
import sys as _sys

_REPO = _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
if _REPO not in _sys.path:
    _sys.path.insert(0, _REPO)


import click
import jax.numpy as jnp

from vision_ft_tpu.utils import safetensors as st

_DTYPES = {
    "bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16,
    "float16": jnp.float16, "fp16": jnp.float16,
    "float32": jnp.float32, "fp32": jnp.float32,
}


@click.command()
@click.option("--input-path", type=str, required=True)
@click.option("--output-path", type=str, required=True)
@click.option("--dtype", type=click.Choice(sorted(_DTYPES)), default="bfloat16")
def main(input_path: str, output_path: str, dtype: str):
    state_dict = st.load_file(input_path, dtype=_DTYPES[dtype])
    st.save_file(state_dict, output_path)
    click.echo(f"Wrote {output_path} ({len(state_dict)} tensors as {dtype})")


if __name__ == "__main__":
    main()
