"""Inference client (reference tools/inference_client.py is a Gradio UI;
gradio isn't in this image, so this is a CLI posting to the server and
reporting per-request latency like the reference UI does)."""

import json
import time
import urllib.request

import click


@click.command()
@click.option("--url", type=str, default="http://127.0.0.1:8123/predict")
@click.option("--prompt", type=str, required=True)
@click.option("--negative-prompt", type=str, default=None)
@click.option("--width", type=int, default=768)
@click.option("--height", type=int, default=1024)
@click.option("--inference-steps", type=int, default=25)
@click.option("--cfg-scale", type=float, default=6.5)
@click.option("--save-path", type=str, default="client_output.webp")
def main(url, prompt, negative_prompt, width, height, inference_steps, cfg_scale, save_path):
    body = {
        "prompt": prompt,
        "width": width,
        "height": height,
        "inference_steps": inference_steps,
        "cfg_scale": cfg_scale,
    }
    if negative_prompt is not None:
        body["negative_prompt"] = negative_prompt
    request = urllib.request.Request(
        url,
        data=json.dumps(body).encode("utf-8"),
        headers={"Content-Type": "application/json"},
    )
    start = time.perf_counter()
    with urllib.request.urlopen(request) as response:
        data = response.read()
    elapsed = time.perf_counter() - start
    with open(save_path, "wb") as f:
        f.write(data)
    click.echo(f"Saved {save_path} ({len(data)} bytes) in {elapsed:.2f}s")


if __name__ == "__main__":
    main()
