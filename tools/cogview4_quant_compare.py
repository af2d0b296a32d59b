"""CogView4 quantization comparison (reference tools/cogview4_quant_compare.py):
generate the same prompt with quantized text encoder / denoiser configs and
record image + peak device memory per run."""

import os as _os
import sys as _sys

_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO not in _sys.path:
    _sys.path.insert(0, _REPO)


import json
from pathlib import Path

import click


def quantize_model(model, text_encoder: str, denoiser: str) -> None:
    """Quantize the two submodule groups in place (reference :15-52)."""
    from vision_ft_tpu.modules.quant import quantize_inplace

    if text_encoder != "bf16":
        model.params = quantize_inplace(
            model.params,
            quant_type=text_encoder,
            include_keys=[
                "q_proj", "k_proj", "v_proj", "o_proj",
                "mlp.down_proj", "mlp.gate_up_proj",
            ],
            exclude_keys=["denoiser.", "vae."],
        )
    if denoiser != "bf16":
        model.params = quantize_inplace(
            model.params,
            quant_type=denoiser,
            include_keys=[
                "to_q", "to_k", "to_v", "to_out.0", "ff.net.0.proj", "ff.net.2",
            ],
            exclude_keys=[
                "time_condition_embed", "patch_embed", "norm_out", "proj_out",
                "norm1", "text_encoder.", "vae.",
            ],
        )


@click.command()
@click.option("--model_path", default="./models/cogview4-6b.bf16.safetensors")
@click.option("--text_encoder", default="bf16", type=str)
@click.option("--denoiser", default="bf16", type=str)
@click.option("--prompt", default="cute anime girl with fluffy fennec ears, maid outfit, victorian kitchen")
@click.option("--height", default=1024)
@click.option("--width", default=1024)
@click.option("--cfg_scale", default=3.5)
@click.option("--num_inference_steps", default=20)
@click.option("--seed", default=0)
@click.option("--output_dir", default="output")
def main(model_path, text_encoder, denoiser, prompt, height, width,
         cfg_scale, num_inference_steps, seed, output_dir):
    import jax

    from vision_ft_tpu.models.cogview4.config import CogView4Config
    from vision_ft_tpu.models.cogview4.pipeline import CogView4Model

    config = CogView4Config(checkpoint_path=model_path, dtype="bfloat16")
    model = CogView4Model.from_checkpoint(config)
    quantize_model(model, text_encoder, denoiser)

    image = model.generate(
        prompt, negative_prompt="blurry, low quality, horror",
        height=height, width=width, cfg_scale=cfg_scale,
        num_inference_steps=num_inference_steps, seed=seed,
    )[0]

    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    run_name = f"text-encoder-{text_encoder}_denoiser-{denoiser}"
    image.save(out / f"{run_name}.webp")
    stats = jax.local_devices()[0].memory_stats() or {}
    report = {
        "run": run_name,
        "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
        "bytes_limit": stats.get("bytes_limit"),
    }
    (out / f"{run_name}.json").write_text(json.dumps(report, indent=2))
    click.echo(f"Image saved to {out / (run_name + '.webp')}")
    click.echo(json.dumps(report))


if __name__ == "__main__":
    main()
