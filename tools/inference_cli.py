"""Single-file inference CLI (reference tools/inference_cli.py, click
instead of fire — fire isn't in this image).

Loads a single-file checkpoint for a model family (auraflow default like
the reference; sdxl and lumina2 too), optionally quantizes the denoiser,
generates, saves webp. Tokenizers load from a local directory
(--tokenizer-path, e.g. a downloaded HF tokenizer folder) since this
environment has no network.
"""

import os as _os
import sys as _sys

_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO not in _sys.path:
    _sys.path.insert(0, _REPO)


from typing import Optional

import click


def _load_tokenizer(family: str, tokenizer_path: Optional[str]):
    if family == "sdxl":
        from vision_ft_tpu.models.text_encoders.tokenizer import CLIPTokenizer

        if tokenizer_path is None:
            raise click.ClickException("--tokenizer-path (vocab.json/merges.txt dir) required")
        return CLIPTokenizer.from_pretrained_dir(tokenizer_path)
    from transformers import AutoTokenizer

    if tokenizer_path is None:
        raise click.ClickException("--tokenizer-path (local HF tokenizer dir) required")
    return AutoTokenizer.from_pretrained(tokenizer_path)


def _build_model(family: str, checkpoint_path: str, tokenizer, quant_type):
    if family == "auraflow":
        from vision_ft_tpu.models.auraflow import AuraFlowConig, AuraFlowModel

        config = AuraFlowConig(checkpoint_path=checkpoint_path)
        model = AuraFlowModel.from_original_checkpoint(config, tokenizer=tokenizer)
    elif family == "sdxl":
        from vision_ft_tpu.models.sdxl.config import SDXLConfig
        from vision_ft_tpu.models.sdxl.pipeline import SDXLModel

        config = SDXLConfig(checkpoint_path=checkpoint_path)
        model = SDXLModel.from_checkpoint(config, tokenizer=tokenizer)
    elif family == "lumina2":
        from vision_ft_tpu.models.lumina2 import Lumina2, Lumina2Config

        config = Lumina2Config(checkpoint_path=checkpoint_path)
        model = Lumina2.from_checkpoint(config, tokenizer=tokenizer)
    elif family == "cogview4":
        from vision_ft_tpu.models.cogview4.config import CogView4Config
        from vision_ft_tpu.models.cogview4.pipeline import CogView4Model

        config = CogView4Config(checkpoint_path=checkpoint_path)
        model = CogView4Model.from_checkpoint(config, tokenizer=tokenizer)
    elif family == "flux":
        # tokenizer is the T5 one; the CLIP tokenizer loads from the same
        # dir's clip/ subfolder when present
        import os

        from vision_ft_tpu.models.flux.config import FluxConfig
        from vision_ft_tpu.models.flux.pipeline import FluxModel
        from vision_ft_tpu.models.text_encoders.tokenizer import CLIPTokenizer

        clip_tok = None
        base = getattr(tokenizer, "name_or_path", None)
        if base and os.path.isdir(os.path.join(str(base), "clip")):
            clip_tok = CLIPTokenizer.from_pretrained_dir(os.path.join(str(base), "clip"))
        config = FluxConfig(checkpoint_path=checkpoint_path)
        model = FluxModel.from_checkpoint(
            config, t5_tokenizer=tokenizer, clip_tokenizer=clip_tok
        )
    elif family == "wan":
        from vision_ft_tpu.models.wan import Wan22, WanConfig

        # Wan splits its checkpoint into three safetensors files; a single
        # --checkpoint-path names the denoiser and the siblings resolve by
        # the reference's file layout (wan/config.py)
        import os

        base = _os.path.dirname(checkpoint_path)
        config = WanConfig(
            denoiser_path=checkpoint_path,
            text_encoder_path=os.path.join(base, "text_encoder.safetensors"),
            vae_path=os.path.join(base, "vae.safetensors"),
        )
        model = Wan22.from_checkpoint(config, tokenizer=tokenizer)
    else:
        raise click.ClickException(f"Unknown family: {family}")

    if quant_type is not None:
        from vision_ft_tpu.modules.quant import quantize_params

        click.echo(f"Quantizing denoiser with {quant_type}...")
        model.params["denoiser"] = quantize_params(
            model.params["denoiser"],
            quant_type,
            include_keys=[""],
            exclude_keys=["t_embedder", "final_linear", "modF"],
        )
    return model


@click.command()
@click.option("--checkpoint-path", type=str, required=True)
@click.option("--family", type=click.Choice(["auraflow", "sdxl", "lumina2", "cogview4", "flux", "wan"]), default="auraflow")
@click.option("--tokenizer-path", type=str, default=None)
@click.option("--prompt", type=str, default="photo of a cat")
@click.option("--negative-prompt", type=str, default="blurry, ugly, low quality")
@click.option("--width", type=int, default=768)
@click.option("--height", type=int, default=768)
@click.option("--batch-size", type=int, default=1)
@click.option("--num-inference-steps", type=int, default=20)
@click.option("--cfg-scale", type=float, default=5.0)
@click.option("--seed", type=int, default=42)
@click.option("--save-path", type=str, default="output.webp")
@click.option("--quant-type", type=str, default=None)
@click.option("--deep-cache-interval", type=int, default=None,
              help="all families: full denoiser pass every N steps, "
              "shallow cached passes between (DeepCache / delta caching)")
@click.option("--frames", type=int, default=16,
              help="wan only: number of video frames")
@click.option("--fps", type=int, default=24,
              help="wan only: mp4 encode frame rate")
@click.option("--cfg-rescale", type=float, default=None,
              help="SDXL only: std-matching CFG rescale blend in [0, 1]")
@click.option("--do-offloading", is_flag=True, default=False,
              help="stage submodules on/off device per generate() phase "
              "(text encode / denoise / decode) — lets models whose summed "
              "weights exceed HBM run, e.g. NF4 Flux on one 16 GB chip")
def main(
    checkpoint_path, family, tokenizer_path, prompt, negative_prompt, width, height,
    batch_size, num_inference_steps, cfg_scale, seed, save_path, quant_type,
    deep_cache_interval, frames, fps, cfg_rescale, do_offloading,
):
    extra = {}
    if do_offloading:
        extra["do_offloading"] = True
    if deep_cache_interval is not None:
        extra["deep_cache_interval"] = deep_cache_interval
    if cfg_rescale is not None:
        if family != "sdxl":
            raise click.UsageError("--cfg-rescale is SDXL-only")
        extra["cfg_rescale"] = cfg_rescale
    if family == "wan":
        extra["frames"] = frames
        if save_path == "output.webp":  # still the image default
            save_path = "output.mp4"

    tokenizer = _load_tokenizer(family, tokenizer_path)
    click.echo("Loading model...")
    model = _build_model(family, checkpoint_path, tokenizer, quant_type)
    click.echo(f"Prompt: {prompt}")
    prompts = [prompt] * batch_size
    images = model.generate(
        prompt=prompts,
        negative_prompt=negative_prompt,
        width=width,
        height=height,
        num_inference_steps=num_inference_steps,
        cfg_scale=cfg_scale,
        seed=seed,
        **extra,
    )
    for i, image in enumerate(images):
        path = save_path if len(images) == 1 else save_path.replace(".", f"_{i}.", 1)
        if isinstance(image, list):  # wan: one video = a list of frames
            from vision_ft_tpu.utils.video import write_images_as_video

            write_images_as_video(image, path, fps=fps)
        else:
            image.save(path)
        click.echo(f"Saved {path}")


if __name__ == "__main__":
    main()
