"""Analytic matmul-bound step floors per family, from XLA's own HLO
cost analysis — no device needed.

For each tracked config this AOT-lowers the EXACT step the timing
harness runs (same builders/shapes as sdxl_train_step.py /
family_train_step.py, gradient checkpointing on, so remat recompute
flops ARE counted) over fully abstract inputs, reads total flops from
``lowered.cost_analysis()``, and divides by the microbenched 190 TF/s
bf16 matmul roofline (tools/bench/device_microbench.py; see
BASELINE.md). The result is the number a measured step time is judged
against: %-of-floor = floor_ms / measured_ms.

Bytes-accessed is also printed but comes from UNOPTIMIZED HLO (every op
round-trips HBM, no fusion), so it is an upper bound only — trust the
flop floor, which fusion cannot change.

Usage: python tools/bench/flop_floor.py [sdxl|lumina2|auraflow|lumina2_gen ...]
           [--batch N] [--res R]
"""

from __future__ import annotations

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp

# floors are hardware-independent; force the host backend so this runs
# while the TPU tunnel is down (and never competes with it). The axon
# sitecustomize imports jax BEFORE this module runs, so env-var writes
# here are too late — only jax.config.update works (same trick as
# tests/conftest.py).
jax.config.update("jax_platforms", "cpu")

MATMUL_TFS = 190.0  # measured bf16 roofline, TF/s
HBM_GBS = 663.0  # measured HBM roofline, GB/s


def _abstract(tree):
    return jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), tree
    )


def _lora_train_pieces(abstract_params, target_keys):
    """Shared LoRA-over-frozen-base setup, all abstract."""
    from vision_ft_tpu.modules.peft import (
        LoRAConfig,
        replace_to_peft_layer,
        split_peft_params,
    )

    def build(p):
        return replace_to_peft_layer(
            p, target_keys, [],
            LoRAConfig(rank=16, alpha=8.0, dtype="bfloat16"),
            jax.random.PRNGKey(1),
        )

    params = jax.eval_shape(build, abstract_params)
    return split_peft_params(params)


def _train_step_lowered(loss_fn, trainable, frozen, batch_dict):
    from vision_ft_tpu.training import get_optimizer, get_schedule, make_train_step
    from vision_ft_tpu.training.train_step import init_train_state

    tx = get_optimizer(
        "torch.optim.AdamW", get_schedule("constant", 1e-4, 1000), max_grad_norm=1.0
    )
    state = jax.eval_shape(lambda t: init_train_state(tx, t), trainable)
    step = make_train_step(loss_fn, tx)
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)
    return step.lower(state, frozen, _abstract(batch_dict), key)


def build_sdxl(batch, res):
    """Tracked config #2/#5 shape: sdxl_train_step.py's exact step."""
    from vision_ft_tpu.models.sdxl.config import DenoiserConfig
    from vision_ft_tpu.models.sdxl.denoiser import Denoiser
    from vision_ft_tpu.modules.loss import diffusion
    from vision_ft_tpu.modules.peft import merge_params
    from vision_ft_tpu.modules.timestep import sampling

    denoiser = Denoiser(DenoiserConfig())
    denoiser.set_gradient_checkpointing(True)
    h = w = res // 8
    abstract = jax.eval_shape(
        lambda k: denoiser.init(k, jnp.bfloat16), jax.random.PRNGKey(0)
    )
    trainable, frozen = _lora_train_pieces(abstract, ["attn1", "attn2", ".ff."])
    batch_dict = {
        "latents": jax.ShapeDtypeStruct((batch, h, w, 4), jnp.bfloat16),
        "context": jax.ShapeDtypeStruct((batch, 227, 2048), jnp.bfloat16),
        "pooled": jax.ShapeDtypeStruct((batch, 1280), jnp.bfloat16),
        "size": jax.ShapeDtypeStruct((batch, 2), jnp.float32),
        "crop": jax.ShapeDtypeStruct((batch, 2), jnp.float32),
    }

    def loss_fn(tr, fr, bd, key):
        p = merge_params(fr, tr)
        k_t, k_n = jax.random.split(key)
        latents = bd["latents"]
        timesteps = sampling.uniform_randint(k_t, latents.shape)
        noised = diffusion.prepare_noised_latents(k_n, latents, timesteps)
        pred = denoiser(
            p, noised.noisy_latents, timesteps.astype(jnp.float32),
            bd["context"], bd["pooled"], bd["size"], bd["size"], bd["crop"],
        )
        return diffusion.loss_with_predicted_noise(
            latents, noised.random_noise, pred
        ), {}

    return _train_step_lowered(loss_fn, trainable, frozen, batch_dict)


def _flow_match_lowered(denoiser, model_fn, trainable, frozen, batch_dict):
    from vision_ft_tpu.modules.loss import flow_match
    from vision_ft_tpu.modules.peft import merge_params

    def loss_fn(tr, fr, bd, key):
        p = merge_params(fr, tr)
        k_t, k_n = jax.random.split(key)
        latents = bd["latents"]
        t = jax.random.uniform(k_t, (latents.shape[0],), jnp.float32)
        noised = flow_match.prepare_noised_latents(k_n, latents, t)
        pred = model_fn(p, noised.noisy_latents.astype(jnp.bfloat16), t, bd)
        return flow_match.loss_with_predicted_velocity(
            latents, noised.random_noise, pred
        ), {}

    return _train_step_lowered(loss_fn, trainable, frozen, batch_dict)


def build_lumina2(batch, res):
    """Tracked config #4 shape: family_train_step.py lumina2 (default
    memory-lean remat: kernel saves only)."""
    from vision_ft_tpu.models.lumina2.config import DenoiserConfig
    from vision_ft_tpu.models.lumina2.denoiser import Denoiser

    config = DenoiserConfig()
    denoiser = Denoiser(config)
    denoiser.set_gradient_checkpointing(True)
    h = w = res // 8
    cap_len = 256
    abstract = jax.eval_shape(
        lambda k: denoiser.init(k, jnp.bfloat16), jax.random.PRNGKey(0)
    )
    trainable, frozen = _lora_train_pieces(
        abstract, ["qkv", ".out", "w1", "w2", "w3"]
    )
    batch_dict = {
        "latents": jax.ShapeDtypeStruct((batch, h, w, config.in_channels), jnp.bfloat16),
        "context": jax.ShapeDtypeStruct((batch, cap_len, config.caption_dim), jnp.bfloat16),
        "mask": jax.ShapeDtypeStruct((batch, cap_len), jnp.int32),
    }

    def model_fn(p, noisy, t, bd):
        velocity, _, _ = denoiser(p, noisy, bd["context"], t, bd["mask"])
        return velocity

    return _flow_match_lowered(denoiser, model_fn, trainable, frozen, batch_dict)


def build_auraflow(batch, res):
    """Tracked config #3 shape: family_train_step.py auraflow. The floor
    uses a bf16 base (the NF4 harness only changes weight storage; the
    dequant adds bytes, not matmul flops)."""
    from vision_ft_tpu.models.auraflow.config import DenoiserConfig
    from vision_ft_tpu.models.auraflow.denoiser import Denoiser

    config = DenoiserConfig()
    denoiser = Denoiser(config)
    denoiser.set_gradient_checkpointing(True)
    h = w = res // 8
    abstract = jax.eval_shape(
        lambda k: denoiser.init(k, jnp.bfloat16), jax.random.PRNGKey(0)
    )
    trainable, frozen = _lora_train_pieces(
        abstract, ["attn", "linear_1", "linear_2", "c_fc1", "c_fc2", "c_proj"]
    )
    batch_dict = {
        "latents": jax.ShapeDtypeStruct((batch, h, w, config.in_channels), jnp.bfloat16),
        "context": jax.ShapeDtypeStruct((batch, 256, config.joint_attention_dim), jnp.bfloat16),
    }

    def model_fn(p, noisy, t, bd):
        return denoiser(p, noisy, bd["context"], t)

    return _flow_match_lowered(denoiser, model_fn, trainable, frozen, batch_dict)


def build_lumina2_gen(batch, res):
    """Lumina2 generate's jit unit: one CFG denoiser forward (the
    denoise-loop cost driver; VAE/text encode amortize across steps)."""
    from vision_ft_tpu.models.lumina2.config import DenoiserConfig
    from vision_ft_tpu.models.lumina2.denoiser import Denoiser

    config = DenoiserConfig()
    denoiser = Denoiser(config)
    h = w = res // 8
    cap_len = 256
    params = jax.eval_shape(
        lambda k: denoiser.init(k, jnp.bfloat16), jax.random.PRNGKey(0)
    )

    def fwd(p, latents, context, t, mask):
        velocity, _, _ = denoiser(p, latents, context, t, mask)
        return velocity

    return jax.jit(fwd).lower(
        params,
        jax.ShapeDtypeStruct((2 * batch, h, w, config.in_channels), jnp.bfloat16),
        jax.ShapeDtypeStruct((2 * batch, cap_len, config.caption_dim), jnp.bfloat16),
        jax.ShapeDtypeStruct((2 * batch,), jnp.float32),
        jax.ShapeDtypeStruct((2 * batch, cap_len), jnp.int32),
    )


BUILDERS = {
    "sdxl": build_sdxl,
    "lumina2": build_lumina2,
    "auraflow": build_auraflow,
    "lumina2_gen": build_lumina2_gen,
}


def main() -> None:
    argv = sys.argv[1:]
    batch, res = 4, 1024
    names = []
    i = 0
    while i < len(argv):
        if argv[i] == "--batch":
            batch = int(argv[i + 1]); i += 2
        elif argv[i] == "--res":
            res = int(argv[i + 1]); i += 2
        else:
            names.append(argv[i]); i += 1
    names = names or ["sdxl", "lumina2", "auraflow"]

    for name in names:
        if name not in BUILDERS:
            sys.exit(f"unknown config {name} ({'|'.join(BUILDERS)})")
        b = 1 if name == "lumina2_gen" else batch
        from vision_ft_tpu.ops.flop_count import count_attention_flops

        with count_attention_flops() as attn:
            lowered = BUILDERS[name](b, res)
        cost = lowered.cost_analysis()
        flops = float(cost.get("flops", 0.0))
        byts = float(cost.get("bytes accessed", 0.0))
        flop_ms = flops / (MATMUL_TFS * 1e12) * 1e3
        # Attention correction (r5): cost_analysis counts the CPU-trace
        # XLA fallback attention (einsum dots at the generic roofline,
        # full-recompute remat structure) while the chip actually runs
        # the Pallas kernels (invisible to cost_analysis) at their OWN
        # d-lane-scaled ceiling with (out,lse) saved — no refwd, and a
        # 5-dot fused backward (2.5x fwd). Subtract the former, add the
        # latter.
        is_train = not name.endswith("_gen")
        xla_counted_ms = (
            attn["fwd_flops"] * (4.0 if is_train else 1.0)
            / (MATMUL_TFS * 1e12) * 1e3
        )
        kernel_ms = attn["fwd_seconds"] * (3.5 if is_train else 1.0) * 1e3
        corrected_ms = flop_ms - xla_counted_ms + kernel_ms
        print(
            json.dumps(
                {
                    "metric": f"{name}_flop_floor_{res}px_b{b}",
                    "value": round(corrected_ms, 1),
                    "unit": "ms_corrected_floor",
                    "dot_only_ms_at_190TFs": round(flop_ms, 1),
                    "attn_fwd_tflops": round(attn["fwd_flops"] / 1e12, 2),
                    "attn_kernel_ms": round(kernel_ms, 1),
                    "attn_xla_counted_ms": round(xla_counted_ms, 1),
                    "attn_calls": attn["calls"],
                    "tflops_per_step": round(flops / 1e12, 2),
                    "unfused_bytes_gb": round(byts / 1e9, 1),
                    "unfused_hbm_ms": round(byts / (HBM_GBS * 1e9) * 1e3, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
