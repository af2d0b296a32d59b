"""Per-quant-config generation benchmark (reference tools/bench/sdxl_quant.py).

Times SDXL txt2img wall-clock and peak device memory for a list of
quantization configs. The reference records CUDA memory-history snapshots;
on TPU we read the device memory_stats (peak_bytes_in_use) around the run.
"""

import os as _os
import sys as _sys

_REPO = _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
if _REPO not in _sys.path:
    _sys.path.insert(0, _REPO)


import json
import time
from typing import Optional

import click


def device_peak_bytes() -> Optional[int]:
    import jax

    stats = jax.local_devices()[0].memory_stats()
    if stats is None:
        return None
    return stats.get("peak_bytes_in_use")


@click.command()
@click.option("--checkpoint-path", type=str, required=True)
@click.option("--tokenizer-path", type=str, required=True)
@click.option("--prompt", type=str, default="1girl, solo, looking at viewer")
@click.option("--width", type=int, default=1024)
@click.option("--height", type=int, default=1024)
@click.option("--num-inference-steps", type=int, default=20)
@click.option("--quant-types", type=str, multiple=True,
              default=("none", "bnb_nf4", "fp8_e4m3fn"))
@click.option("--output", type=str, default="bench_sdxl_quant.json")
def main(checkpoint_path, tokenizer_path, prompt, width, height,
         num_inference_steps, quant_types, output):
    from vision_ft_tpu.models.sdxl.config import SDXLConfig
    from vision_ft_tpu.models.sdxl.pipeline import SDXLModel
    from vision_ft_tpu.models.text_encoders.tokenizer import CLIPTokenizer
    from vision_ft_tpu.modules.quant import quantize_params

    tokenizer = CLIPTokenizer.from_pretrained_dir(tokenizer_path)
    results = []
    for quant_type in quant_types:
        config = SDXLConfig(checkpoint_path=checkpoint_path)
        model = SDXLModel.from_checkpoint(config, tokenizer=tokenizer)
        if quant_type != "none":
            model.params["denoiser"] = quantize_params(
                model.params["denoiser"], quant_type, include_keys=["attn", "ff"],
            )
        # warmup compiles
        model.generate(prompt, width=width, height=height, num_inference_steps=2, seed=0)
        start = time.perf_counter()
        model.generate(
            prompt, width=width, height=height,
            num_inference_steps=num_inference_steps, seed=0,
        )
        elapsed = time.perf_counter() - start
        peak = device_peak_bytes()
        entry = {
            "quant_type": quant_type,
            "elapsed_s": round(elapsed, 3),
            "imgs_per_s": round(1.0 / elapsed, 4),
            "peak_bytes": peak,
        }
        click.echo(json.dumps(entry))
        results.append(entry)
        del model

    with open(output, "w") as f:
        json.dump(results, f, indent=2)
    click.echo(f"Wrote {output}")


if __name__ == "__main__":
    main()
