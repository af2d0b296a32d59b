"""Convert a PyTorch pickle checkpoint to safetensors
(reference tools/checkpoint/to_safetensors.py)."""

import os as _os
import sys as _sys

_REPO = _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
if _REPO not in _sys.path:
    _sys.path.insert(0, _REPO)


import click


@click.command()
@click.argument("input_path", type=click.Path(exists=True, dir_okay=False))
@click.argument("output_path", type=click.Path(dir_okay=False))
def main(input_path: str, output_path: str):
    """INPUT_PATH: torch .pt/.bin/.ckpt file. OUTPUT_PATH: .safetensors."""
    import numpy as np
    import torch

    from vision_ft_tpu.utils import safetensors as st

    click.echo(f"Converting {input_path} to safetensors...")
    state_dict = torch.load(input_path, map_location="cpu", weights_only=True)
    if "state_dict" in state_dict and isinstance(state_dict["state_dict"], dict):
        state_dict = state_dict["state_dict"]
    click.echo(f"Loaded {len(state_dict)} tensors.")
    arrays = {
        k: np.asarray(v.detach().to(torch.float32) if v.dtype == torch.bfloat16 else v)
        for k, v in state_dict.items()
        if hasattr(v, "detach")
    }
    st.save_file(arrays, output_path)
    click.echo(f"Saved to {output_path}.")


if __name__ == "__main__":
    main()
