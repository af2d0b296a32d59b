"""Bisect the cogview4 on-chip compile crash (r4: tpu_compile_helper
subprocess exit 1 on the first generate of every cogview4 run, with both
attention paths and legacy kernels — i.e. predating the r4 kernel work;
this was the family's first on-chip run).

Compiles/executes each stage of the generate path in isolation:
text encoder -> denoiser (CFG batch) -> scheduler step -> VAE decode.

Usage: python tools/bench/cogview4_bisect.py [--res 1024]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(_REPO, "tools", "bench"))


def _stage(name, fn):
    t0 = time.time()
    try:
        out = fn()
        jax.block_until_ready(out)
        print(f"[bisect] {name}: OK ({time.time() - t0:.0f}s)", flush=True)
        return True
    except Exception as exc:
        print(f"[bisect] {name}: FAIL {type(exc).__name__}: {str(exc)[:300]}",
              flush=True)
        traceback.print_exc(limit=3)
        return False


def main() -> None:
    cache = os.path.join(_REPO, ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    res = 1024
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--res":
            res = int(argv[i + 1])

    from family_generate import MockHFTokenizer

    from vision_ft_tpu.models.cogview4.config import CogView4Config
    from vision_ft_tpu.models.cogview4.pipeline import CogView4Model

    model = CogView4Model(
        CogView4Config(checkpoint_path="/nonexistent", dtype="bfloat16"),
        tokenizer=MockHFTokenizer(),
    )
    model.init_params(jax.random.PRNGKey(0))
    print("[bisect] init done", flush=True)

    enc_holder = {}

    def enc():
        out = model.text_encoder.encode_prompts(
            model.params["text_encoder"], ["a photo of a cat"], None,
            use_negative_prompts=True,
        )
        enc_holder["out"] = out
        return out.positive_embeddings

    _stage("text_encoder", enc)

    h = w = res // int(model.vae.compression_ratio)
    c = model.denoiser.config.in_channels
    latents = jax.random.normal(jax.random.PRNGKey(1), (1, h, w, c), jnp.bfloat16)

    def denoiser_plain():
        out = enc_holder["out"]
        emb = jnp.concatenate(
            [out.positive_embeddings, out.negative_embeddings]
        ).astype(model.dtype)
        lat2 = jnp.concatenate([latents, latents])
        t = jnp.full((2,), 500.0, jnp.float32)
        size = jnp.full((2, 2), float(res), jnp.float32)
        crop = jnp.zeros((2, 2), jnp.float32)
        return model.denoiser(
            model.params["denoiser"], lat2, emb, t, size, size, crop
        )

    _stage("denoiser_cfg_batch", denoiser_plain)

    def vae_dec():
        return model.vae.decode(
            model.params["vae"], latents.astype(model.dtype) / model.vae.scaling_factor
        )

    _stage("vae_decode", vae_dec)

    def full_gen():
        return model.generate(
            "a photo of a cat", seed=0, width=res, height=res,
            num_inference_steps=2, cfg_scale=4.0,
        )[0]

    _stage("full_generate_2steps", lambda: jnp.zeros(()) if full_gen() else jnp.zeros(()))


if __name__ == "__main__":
    main()
