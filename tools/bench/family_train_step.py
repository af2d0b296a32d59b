"""Full-size LoRA train-step benchmarks for the non-SDXL tracked configs.

BASELINE.json config #3 (AuraFlow flow-matching MMDiT LoRA, NF4 base —
the reference's 24 GB + bitsandbytes posture) and #4 (Lumina2 NextDiT
LoRA fine-tune, bf16 base). Same harness shape as sdxl_train_step.py:
jitted value_and_grad + AdamW over LoRA params, frozen base, cached
latents/text features, gradient checkpointing on.

Usage: python tools/bench/family_train_step.py [auraflow|lumina2]
           [--batch N] [--res R] [--profile DIR]
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp


def main() -> None:
    family = "lumina2"
    batch, res = 4, 1024
    profile_dir = None
    remat_group = 1
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a in ("auraflow", "lumina2"):
            family = a
        elif a == "--batch":
            batch = int(argv[i + 1])
        elif a == "--res":
            res = int(argv[i + 1])
        elif a == "--profile":
            profile_dir = argv[i + 1]
        elif a == "--remat-group":
            remat_group = int(argv[i + 1])

    cache_dir = os.path.join(_REPO, ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vision_ft_tpu.modules.loss import flow_match
    from vision_ft_tpu.modules.peft import (
        LoRAConfig,
        merge_params,
        replace_to_peft_layer,
        split_peft_params,
    )
    from vision_ft_tpu.modules.timestep import sampling
    from vision_ft_tpu.training import get_optimizer, get_schedule, make_train_step
    from vision_ft_tpu.training.train_step import init_train_state

    key = jax.random.PRNGKey(0)
    if family == "auraflow":
        from vision_ft_tpu.models.auraflow.config import DenoiserConfig
        from vision_ft_tpu.models.auraflow.denoiser import Denoiser

        config = DenoiserConfig()
        denoiser = Denoiser(config)
        h = w = res // 8
        cap_len = 256
        batch_dict = {
            "latents": jax.random.normal(key, (batch, h, w, config.in_channels), jnp.bfloat16),
            "context": jax.random.normal(
                key, (batch, cap_len, config.joint_attention_dim), jnp.bfloat16
            ),
        }

        def model_fn(p, noisy, timesteps, bd):
            return denoiser(p, noisy, bd["context"], timesteps)

        target_keys = ["attn", "linear_1", "linear_2", "c_fc1", "c_fc2", "c_proj"]
        quantize_base = True  # 6.8B bf16 params would not fit 16 GB
    else:
        from vision_ft_tpu.models.lumina2.config import DenoiserConfig
        from vision_ft_tpu.models.lumina2.denoiser import Denoiser

        config = DenoiserConfig()
        denoiser = Denoiser(config)
        h = w = res // 8
        cap_len = 256
        batch_dict = {
            "latents": jax.random.normal(key, (batch, h, w, config.in_channels), jnp.bfloat16),
            "context": jax.random.normal(
                key, (batch, cap_len, config.caption_dim), jnp.bfloat16
            ),
            "mask": jnp.ones((batch, cap_len), jnp.int32),
        }

        def model_fn(p, noisy, timesteps, bd):
            velocity, _, _ = denoiser(p, noisy, bd["context"], timesteps, bd["mask"])
            return velocity

        target_keys = ["qkv", ".out", "w1", "w2", "w3"]
        quantize_base = False

    denoiser.set_gradient_checkpointing(True)
    # Both full-size configs exceed 15.75 GB HBM with the SDXL-tuned
    # activation saves on: AuraFlow is a 6.8B base, and Lumina2's saved
    # SwiGLU inners are 306 MB x 26 layers (batch 4 @ 1024px packs 4352
    # tokens through a 9216-wide ff). Keep only the flash (out, lse)
    # kernel saves; recompute projections/ff in the backward.
    # --save-qkv re-enables the qkv saves (Lumina2's GQA now tags its
    # pre-repeat k/v, ~141 MB/layer instead of 311) for A/B on-chip.
    # AuraFlow can't afford even the kernel saves: 36 double blocks x
    # 108 MB bf16[4,4608,3072] flash outs ~ 3.9 GB on top of the 3.4 GB
    # NF4 base + f32 LoRA/AdamW state blows 15.75 GB (measured OOM,
    # r3) — default it to plain full remat; --save-kernel A/Bs it back.
    from vision_ft_tpu.nn.core import (
        set_remat_save_ff,
        set_remat_save_qkv,
        set_remat_saves,
    )

    if family == "auraflow" and "--save-kernel" not in argv:
        set_remat_saves("none")
    set_remat_save_qkv("--save-qkv" in argv)
    set_remat_save_ff("--save-ff" in argv)
    if remat_group > 1:
        from vision_ft_tpu.nn.core import set_remat_group

        set_remat_group(remat_group)
    abstract = jax.eval_shape(lambda k: denoiser.init(k, jnp.bfloat16), key)
    if quantize_base:
        # 6.8B bf16 zeros would fill the 16 GB chip (and packing zeros
        # through the real quantizer costs minutes for nothing) — build
        # the packed-NF4 layout straight from shapes on host
        from quant_zeros import quantize_params_zeros

        params = jax.device_put(
            quantize_params_zeros(abstract, target_keys), jax.devices()[0]
        )
    else:
        params = jax.tree.map(lambda a: jnp.zeros(a.shape, a.dtype), abstract)
    params = replace_to_peft_layer(
        params, target_keys, [], LoRAConfig(rank=16, alpha=8.0, dtype="bfloat16"),
        jax.random.PRNGKey(1),
    )
    trainable, frozen = split_peft_params(params)
    n_lora = sum(x.size for x in jax.tree.leaves(trainable))
    print(
        f"[{family}] LoRA params: {n_lora/1e6:.1f}M, batch {batch} @ {res}px"
        f"{' (NF4 base)' if quantize_base else ''}",
        file=sys.stderr, flush=True,
    )

    def loss_fn(tr, fr, bd, key):
        p = merge_params(fr, tr)
        k_t, k_n = jax.random.split(key)
        latents = bd["latents"]
        # uniform t in (0, 1) — the flow-match trainers' sampling
        t = jax.random.uniform(k_t, (latents.shape[0],), jnp.float32)
        noised = flow_match.prepare_noised_latents(k_n, latents, t)
        pred = model_fn(p, noised.noisy_latents.astype(jnp.bfloat16), t, bd)
        return (
            flow_match.loss_with_predicted_velocity(
                latents, noised.random_noise, pred
            ),
            {},
        )

    tx = get_optimizer(
        "torch.optim.AdamW", get_schedule("constant", 1e-4, 1000), max_grad_norm=1.0
    )
    state = init_train_state(tx, trainable)
    step = make_train_step(loss_fn, tx)

    state, m = step(state, frozen, batch_dict, key)
    jax.block_until_ready(m)
    state, m = step(state, frozen, batch_dict, key)
    jax.block_until_ready(m)

    if profile_dir:
        with jax.profiler.trace(profile_dir):
            for _ in range(2):
                state, m = step(state, frozen, batch_dict, key)
            jax.block_until_ready(m)

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, frozen, batch_dict, key)
        # block EVERY iteration (see sdxl_train_step.py: a final-only
        # block mis-reported an impossible step time once on axon)
        jax.block_until_ready(m)
    el = (time.perf_counter() - t0) / iters

    print(
        json.dumps(
            {
                "metric": f"{family}_lora_train_step_{res}px_b{batch}",
                "value": round(el * 1e3, 1),
                "unit": "ms/step",
                "imgs_per_sec": round(batch / el, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
