"""Offline checkpoint quantizer (reference tools/quantize_model.py).

Quantizes targeted tensors of a single-file safetensors checkpoint into the
bnb on-disk format (packed 4-bit + quant-state tensors) or fp8, writing a
checkpoint that both this framework and bitsandbytes-based loaders accept.

Usage:
  python tools/quantize_model.py --model-path models/aura_flow_0.3.safetensors \
      --save-path models/aura_flow_0.3.bnb_nf4.safetensors --quant-type bnb_nf4
"""

import os as _os
import sys as _sys

_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO not in _sys.path:
    _sys.path.insert(0, _REPO)


import click

from vision_ft_tpu.modules.quant import quantize_state_dict, validate_quant_type
from vision_ft_tpu.utils import safetensors as st


@click.command()
@click.option("--model-path", type=str, required=True)
@click.option("--save-path", type=str, required=True)
@click.option("--quant-type", type=str, default="bnb_nf4")
@click.option("--include-keys", type=str, multiple=True, default=("model.",))
@click.option(
    "--exclude-keys",
    type=str,
    multiple=True,
    default=("t_embedder", "final_linear", "modF"),
)
def main(model_path, save_path, quant_type, include_keys, exclude_keys):
    validate_quant_type(quant_type)
    click.echo(f"Include keys: {list(include_keys)}")
    click.echo(f"Exclude keys: {list(exclude_keys)}")
    click.echo(f"Loading checkpoint from {model_path}")
    state_dict = st.load_file(model_path)
    click.echo(f"Quantizing to {quant_type}...")
    quantized = quantize_state_dict(
        state_dict, quant_type, list(include_keys), list(exclude_keys)
    )
    click.echo(f"Saving to {save_path}")
    st.save_file(quantized, save_path)
    click.echo("Done!")


if __name__ == "__main__":
    main()
