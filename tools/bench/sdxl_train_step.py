"""Full-size SDXL LoRA train-step benchmark on one TPU chip.

Measures BASELINE.md tracked config #2's inner loop: jitted
value_and_grad + AdamW update over LoRA params (rank 16 on attn/ff
Linears), frozen bf16 base, cached latents/text embeddings (the
recommended training path — SURVEY.md §3.1 notes the reference re-encodes
both every step), gradient checkpointing on.

Usage: python tools/bench/sdxl_train_step.py [--batch 4] [--res 1024] [--nf4]

--nf4 quantizes the frozen base to bnb-layout NF4 (tracked config #5's
QLoRA posture: /root/reference's bitsandbytes NF4 + LoRA): attn/ff Linear
weights stored packed-4bit and dequantized inside the step via the
gather-free fused kernel.
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp


def main() -> None:
    batch, res = 4, 1024
    nf4 = False
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--batch":
            batch = int(argv[i + 1])
        elif a == "--res":
            res = int(argv[i + 1])
        elif a == "--nf4":
            nf4 = True

    cache_dir = os.path.join(_REPO, ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vision_ft_tpu.models.sdxl.config import DenoiserConfig
    from vision_ft_tpu.models.sdxl.denoiser import Denoiser
    from vision_ft_tpu.modules.loss import diffusion
    from vision_ft_tpu.modules.peft import (
        LoRAConfig,
        merge_params,
        replace_to_peft_layer,
        split_peft_params,
    )
    from vision_ft_tpu.modules.timestep import sampling
    from vision_ft_tpu.training import get_optimizer, get_schedule, make_train_step
    from vision_ft_tpu.training.train_step import init_train_state

    config = DenoiserConfig()
    denoiser = Denoiser(config)
    denoiser.set_gradient_checkpointing(True)
    if nf4:
        # memory-lean remat (same posture as the 6.8B AuraFlow NF4 config):
        # the dequantized bf16 weight temps XLA materializes alongside the
        # packed base push peak HBM past 16 GB with the speed-side saves on
        from vision_ft_tpu.nn.core import set_remat_save_ff, set_remat_save_qkv

        set_remat_save_qkv(False)
        set_remat_save_ff(False)

    h = w = res // 8
    abstract = jax.eval_shape(lambda k: denoiser.init(k, jnp.bfloat16), jax.random.PRNGKey(0))
    if nf4:
        from quant_zeros import quantize_params_zeros

        params = jax.device_put(
            quantize_params_zeros(abstract, ["attn1", "attn2", ".ff."]),
            jax.devices()[0],
        )
    else:
        params = jax.tree.map(lambda a: jnp.zeros(a.shape, a.dtype), abstract)
    params = replace_to_peft_layer(
        params,
        ["attn1", "attn2", ".ff."],
        [],
        LoRAConfig(rank=16, alpha=8.0, dtype="bfloat16"),
        jax.random.PRNGKey(1),
    )
    trainable, frozen = split_peft_params(params)
    n_lora = sum(x.size for x in jax.tree.leaves(trainable))
    print(f"LoRA params: {n_lora/1e6:.1f}M, batch {batch} @ {res}px", file=sys.stderr)

    def loss_fn(tr, fr, batch_dict, key):
        p = merge_params(fr, tr)
        k_t, k_n = jax.random.split(key)
        latents = batch_dict["latents"]
        timesteps = sampling.uniform_randint(k_t, latents.shape)
        noised = diffusion.prepare_noised_latents(k_n, latents, timesteps)
        pred = denoiser(
            p,
            noised.noisy_latents,
            timesteps.astype(jnp.float32),
            batch_dict["context"],
            batch_dict["pooled"],
            batch_dict["size"],
            batch_dict["size"],
            batch_dict["crop"],
        )
        return diffusion.loss_with_predicted_noise(latents, noised.random_noise, pred), {}

    tx = get_optimizer(
        "torch.optim.AdamW", get_schedule("constant", 1e-4, 1000), max_grad_norm=1.0
    )
    state = init_train_state(tx, trainable)
    step = make_train_step(loss_fn, tx)

    key = jax.random.PRNGKey(2)
    batch_dict = {
        "latents": jax.random.normal(key, (batch, h, w, 4), jnp.bfloat16),
        "context": jax.random.normal(key, (batch, 225 + 2, 2048), jnp.bfloat16),
        "pooled": jax.random.normal(key, (batch, 1280), jnp.bfloat16),
        "size": jnp.full((batch, 2), float(res), jnp.float32),
        "crop": jnp.zeros((batch, 2), jnp.float32),
    }

    state, m = step(state, frozen, batch_dict, key)
    jax.block_until_ready(m)
    state, m = step(state, frozen, batch_dict, key)
    jax.block_until_ready(m)

    profile_dir = None
    for i, a in enumerate(argv):
        if a == "--profile":
            profile_dir = argv[i + 1]

    iters = 5
    if profile_dir:
        with jax.profiler.trace(profile_dir):
            for _ in range(2):
                state, m = step(state, frozen, batch_dict, key)
            jax.block_until_ready(m)
    if "--chain" in argv:
        # device-true timing: dispatch the whole window, then fetch ONE
        # scalar that depends on every step through the state chain (a
        # host transfer cannot be early-acked, unlike block_until_ready
        # — see docs/PERFORMANCE.md "batch-1 pathology"). The per-step
        # blocking mode below additionally pays one tunnel round trip
        # per iteration (~35 ms measured), which is bench overhead, not
        # device time.
        float(jnp.asarray(m["train/loss"]))  # drain warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, frozen, batch_dict, key)
        float(jnp.asarray(m["train/loss"]))
        el = (time.perf_counter() - t0) / iters
    else:
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, frozen, batch_dict, key)
            # block EVERY iteration: one r4c run on the axon backend reported
            # 21.7 ms/step (impossible) with only the final block — the
            # tunnel appears to ack in-flight chains early in some states
            jax.block_until_ready(m)
        el = (time.perf_counter() - t0) / iters

    import json

    print(
        json.dumps(
            {
                "metric": f"sdxl_lora_train_step_{res}px_b{batch}",
                "value": round(el * 1e3, 1),
                "unit": "ms/step",
                "imgs_per_sec": round(batch / el, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
