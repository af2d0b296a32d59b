"""SDXL flow-match conversion + migration scale + offload bookkeeping."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tests")

from vision_ft_tpu.models.autoencoder import AutoencoderKLConfig
from vision_ft_tpu.models.sdxl.adapter.flow_match import (
    SDXLFlowMatch,
    SDXLFlowMatchConfig,
)
from vision_ft_tpu.models.sdxl.config import DenoiserConfig
from vision_ft_tpu.models.text_encoders import CLIPTextConfig
from vision_ft_tpu.modules.migration import MigrationScaleFromZero
from vision_ft_tpu.modules.offload import LayerwiseOfflodStrategy, move_params


class MockTokenizer:
    bos_token_id = 0
    eos_token_id = 999
    pad_token_id = 999

    def __call__(self, prompts, max_length=None, **kw):
        rows = []
        for p in prompts:
            ids = [3 + (hash(w) % 900) for w in p.split()][: max_length - 2]
            row = [0, *ids, 999]
            row += [999] * (max_length - len(row))
            rows.append(row)
        return np.asarray(rows, dtype=np.int32)


def _tiny_fm_model(model_prediction="velocity"):
    config = SDXLFlowMatchConfig(
        checkpoint_path="unused",
        dtype="float32",
        model_prediction=model_prediction,
        denoiser=DenoiserConfig(
            hidden_dim=32, num_head_channels=8, context_dim=112,
            block_out_channels=[32, 64, 64], num_transformers_per_block=[1, 1, 1],
        ),
    )
    return SDXLFlowMatch(
        config,
        tokenizer=MockTokenizer(),
        vae_config=AutoencoderKLConfig(
            block_out_channels=(8, 8, 16, 16), latent_channels=4, norm_num_groups=4
        ),
        text_encoder_config_1=CLIPTextConfig(
            vocab_size=1000, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, hidden_act="quick_gelu",
        ),
        text_encoder_config_2=CLIPTextConfig(
            vocab_size=1000, hidden_size=48, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4, hidden_act="gelu",
            projection_dim=1280,
        ),
    )


@pytest.mark.parametrize("model_prediction", ["velocity", "image"])
def test_flow_match_generate(model_prediction):
    model = _tiny_fm_model(model_prediction)
    model.init_params(jax.random.PRNGKey(0))
    images = model.generate(
        "a cat", width=32, height=32, num_inference_steps=2, cfg_scale=2.0, seed=0
    )
    assert len(images) == 1 and images[0].size == (32, 32)


def test_flow_match_sigma_schedule():
    model = _tiny_fm_model()
    timesteps, sigmas = model.prepare_timesteps(4)
    np.testing.assert_allclose(timesteps, [1000.0, 667.0, 334.0, 1.0])
    np.testing.assert_allclose(sigmas[:-1], timesteps / 1000.0)
    assert sigmas[-1] == 0.0


def test_migration_scale():
    module = MigrationScaleFromZero()
    params = module.init(jax.random.PRNGKey(0))
    old = jnp.ones((2, 3))
    new = jnp.full((2, 3), 5.0)
    # zero-init -> old value passes through
    np.testing.assert_allclose(np.asarray(module(params, old, new)), np.asarray(old))
    # scale 0.5 -> midpoint
    mid = module({"scale": jnp.asarray([0.5])}, old, new)
    np.testing.assert_allclose(np.asarray(mid), 3.0)
    # rezero on load
    rezeroed = MigrationScaleFromZero.rezero({"scale": jnp.asarray([0.7])})
    assert float(rezeroed["scale"][0]) == 0.0
    # no freezing_threshold -> gradient always flows (reference scale.py:21-28)
    grad_fn = jax.grad(lambda p: jnp.sum(module(p, old, new)))
    assert abs(float(grad_fn({"scale": jnp.asarray([0.5])})["scale"][0])) > 0
    assert abs(float(grad_fn({"scale": jnp.asarray([1.0])})["scale"][0])) > 0
    # with a threshold, the blend freezes (detaches) once |1 - s| < eps
    frozen_module = MigrationScaleFromZero(freezing_threshold=1e-3)
    frozen_grad = jax.grad(lambda p: jnp.sum(frozen_module(p, old, new)))
    assert float(frozen_grad({"scale": jnp.asarray([0.9999])})["scale"][0]) == 0.0
    assert abs(float(frozen_grad({"scale": jnp.asarray([0.5])})["scale"][0])) > 0


def test_layerwise_offload_strategy():
    params = {
        "layers": {
            "0": {"w": jnp.ones((4,))},
            "1": {"w": jnp.ones((4,))},
            "2": {"w": jnp.ones((4,))},
        }
    }
    strategy = LayerwiseOfflodStrategy(
        [["layers.0"], ["layers.1"], ["layers.2"]],
        execution_device="cpu", offload_device="cpu",
    )
    assert strategy.group_index_of("layers.1.w") == 1
    assert strategy.group_index_of("other.w") is None
    out = strategy.maybe_offload_by_group(params, 1)
    assert jax.tree.structure(out) == jax.tree.structure(params)
    moved = move_params(params, "cpu")
    assert jax.tree.structure(moved) == jax.tree.structure(params)
