"""Offload module: subtree moves, layerwise strategy, generate()-stage
offload. Reference analogue: src/modules/offload.py (+ the whole-submodule
moves inside the reference's generate(), sdxl/pipeline.py:322-413).

Placement is observable on the 8-device virtual CPU mesh: cpu:0 stands in
for the execution device and cpu:1 for the offload target.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vision_ft_tpu.modules.offload import (
    LayerwiseOfflodStrategy,
    move_params,
    move_subtrees,
    stage_on_device,
)


def _devices_of(params):
    return {k: next(iter(v.devices())) for k, v in params.items()}


def test_move_subtrees_only_touches_prefixes():
    d0, d1 = jax.devices()[0], jax.devices()[1]
    params = {
        "denoiser": {"w": jnp.ones((2, 2))},
        "vae": {"w": jnp.ones((2, 2))},
    }
    moved = move_subtrees(params, ["denoiser"], d1)
    assert next(iter(moved["denoiser"]["w"].devices())) == d1
    assert next(iter(moved["vae"]["w"].devices())) == d0


def test_layerwise_strategy_streams_groups():
    d0, d1 = jax.devices()[0], jax.devices()[1]
    strat = LayerwiseOfflodStrategy(
        [["blocks.0"], ["blocks.1"]], execution_device=d0, offload_device=d1
    )
    params = {"blocks": {"0": {"w": jnp.ones(2)}, "1": {"w": jnp.ones(2)}}}
    parked = strat.offload_all(params)
    assert next(iter(parked["blocks"]["0"]["w"].devices())) == d1
    assert next(iter(parked["blocks"]["1"]["w"].devices())) == d1

    # entering group 1 brings it on-device and parks group 0
    step1 = strat.maybe_offload_by_group(
        strat.maybe_offload_by_group(parked, 0), 1
    )
    assert next(iter(step1["blocks"]["1"]["w"].devices())) == d0
    assert next(iter(step1["blocks"]["0"]["w"].devices())) == d1


def test_stage_on_device_round_trips_placement():
    d0, d1 = jax.devices()[0], jax.devices()[1]
    params = {"text_encoder": {"w": jax.device_put(jnp.ones(2), d1)}}
    with stage_on_device(params, "text_encoder", True, execution=d0, offload=d1):
        assert next(iter(params["text_encoder"]["w"].devices())) == d0
    assert next(iter(params["text_encoder"]["w"].devices())) == d1

    # disabled -> no moves at all
    before = params["text_encoder"]["w"]
    with stage_on_device(params, "text_encoder", False, execution=d0, offload=d1):
        assert params["text_encoder"]["w"] is before
    assert params["text_encoder"]["w"] is before


def test_generate_with_offloading_matches_plain():
    """do_offloading=True runs the staged path and produces the same image
    (on the CPU backend the moves are same-device, but every stage
    transition executes)."""
    from vision_ft_tpu.models.auraflow.config import AuraFlowConig, DenoiserConfig
    from vision_ft_tpu.models.auraflow.pipeline import AuraFlowModel
    from vision_ft_tpu.models.autoencoder import AutoencoderKLConfig
    from vision_ft_tpu.models.text_encoders.umt5 import UMT5Config

    class Tok:
        def __call__(self, prompts, max_length=None, **kw):
            ids, mask = [], []
            for p in prompts:
                t = [3 + (hash(w) % 120) for w in p.split()][:max_length]
                pad = max_length - len(t)
                ids.append(t + [0] * pad)
                mask.append([1] * len(t) + [0] * pad)
            return {"input_ids": ids, "attention_mask": mask}

    tiny = dict(
        in_channels=4, out_channels=4, patch_size=2, caption_projection_dim=64,
        num_double_layers=1, num_single_layers=2, num_attention_heads=2,
        attention_head_dim=32, joint_attention_dim=48, pos_embed_max_size=256,
        num_register_tokens=2, use_flash_attn=False,
    )
    model = AuraFlowModel(
        AuraFlowConig(checkpoint_path="unused", dtype="float32",
                      denoiser=DenoiserConfig(**tiny)),
        tokenizer=Tok(),
        vae_config=AutoencoderKLConfig(
            block_out_channels=(8, 8, 16, 16), latent_channels=4, norm_num_groups=4
        ),
        text_encoder_config=UMT5Config(
            vocab_size=128, d_model=48, d_kv=8, d_ff=64, num_layers=2, num_heads=4,
            relative_attention_num_buckets=8, relative_attention_max_distance=16,
        ),
    )
    model.init_params(jax.random.PRNGKey(0))
    kw = dict(width=32, height=32, num_inference_steps=2, cfg_scale=1.5,
              max_token_length=8, seed=7)
    plain = model.generate("a cat", **kw)
    staged = model.generate("a cat", do_offloading=True, **kw)
    np.testing.assert_array_equal(np.asarray(staged[0]), np.asarray(plain[0]))
