"""Reward models (native CLIP vision / PickScore) parity + DRaFT+ training."""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from vision_ft_tpu.nn import flatten_params, unflatten_params

TINY_VISION = dict(
    hidden_size=32, intermediate_size=64, num_hidden_layers=2,
    num_attention_heads=4, image_size=16, patch_size=8, projection_dim=24,
)
TINY_TEXT = dict(
    vocab_size=100, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
    num_attention_heads=4, projection_dim=24,
)


def test_clip_vision_parity_vs_transformers():
    import torch
    from transformers import CLIPVisionConfig as HFConfig
    from transformers import CLIPVisionModelWithProjection as HFModel

    from vision_ft_tpu.models.vision_encoders import (
        CLIPVisionConfig,
        CLIPVisionModelWithProjection,
    )

    torch.manual_seed(0)
    hf = HFModel(HFConfig(**TINY_VISION, hidden_act="quick_gelu")).eval()
    ours = CLIPVisionModelWithProjection(
        CLIPVisionConfig(**TINY_VISION, hidden_act="quick_gelu")
    )
    flat = {
        k: jnp.asarray(v.numpy())
        for k, v in hf.state_dict().items()
        if "position_ids" not in k
    }
    assert set(flat.keys()) == set(
        flatten_params(ours.init(jax.random.PRNGKey(0))).keys()
    )
    params = unflatten_params(flat)

    pixels = np.random.default_rng(0).standard_normal((2, 3, 16, 16), np.float32)
    with torch.no_grad():
        expected = hf(pixel_values=torch.from_numpy(pixels)).image_embeds.numpy()
    _, got = ours(params, jnp.asarray(pixels.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), expected, atol=2e-5, rtol=2e-5)


def _tiny_pickscore():
    import torch
    from transformers import CLIPConfig, CLIPModel

    from vision_ft_tpu.models.text_encoders.clip import CLIPTextConfig
    from vision_ft_tpu.models.vision_encoders import CLIPVisionConfig
    from vision_ft_tpu.modules.reward.pickscore import PickScoreRewardModel

    torch.manual_seed(0)
    hf = CLIPModel(
        CLIPConfig(
            text_config=dict(
                **TINY_TEXT, hidden_act="gelu", eos_token_id=99, max_position_embeddings=77
            ),
            vision_config=dict(**TINY_VISION, hidden_act="gelu"),
            projection_dim=24,
        )
    ).eval()
    flat = {
        k: jnp.asarray(v.numpy())
        for k, v in hf.state_dict().items()
        if "position_ids" not in k
    }
    ours = PickScoreRewardModel(
        unflatten_params(flat),
        text_config=CLIPTextConfig(**TINY_TEXT, hidden_act="gelu"),
        vision_config=CLIPVisionConfig(**TINY_VISION, hidden_act="gelu"),
    )
    return hf, ours


def test_pickscore_score_parity():
    import torch

    hf, ours = _tiny_pickscore()
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 98, (2, 10))
    ids[:, -1] = 99  # eos
    pixels = rng.standard_normal((2, 3, 16, 16), np.float32).clip(-1, 1)

    with torch.no_grad():
        t = hf.get_text_features(input_ids=torch.from_numpy(ids))
        t = t / t.norm(dim=-1, keepdim=True)
        # bypass resize: feed the already-sized pixels through the tower
        v = hf.get_image_features(pixel_values=torch.from_numpy(pixels))
        v = v / v.norm(dim=-1, keepdim=True)
        expected = (hf.logit_scale.exp() * (t * v).sum(-1)).numpy()

    te = ours.text_embeds(jnp.asarray(ids))
    ve_in = jnp.asarray(pixels.transpose(0, 2, 3, 1))
    _, ve = ours.vision_model(ours._vision_params(), ve_in)
    ve = ve / jnp.linalg.norm(ve, axis=-1, keepdims=True)
    got = np.asarray(
        jnp.exp(ours.params["logit_scale"]) * jnp.sum(te * ve, axis=-1)
    )
    np.testing.assert_allclose(got, expected, atol=3e-4, rtol=3e-4)


def test_pickscore_differentiable_score():
    _, ours = _tiny_pickscore()
    ids = np.full((1, 8), 5)
    ids[:, -1] = 99
    images = jnp.zeros((1, 16, 16, 3), jnp.float32)

    def reward(images):
        return jnp.mean(ours.score(images, jnp.asarray(ids)))

    g = jax.grad(reward)(images)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


class _DummyReward:
    """Differentiable toy reward: prefers darker images."""

    tokenizer = None

    def __call__(self, images, prompts):
        raise NotImplementedError

    def score(self, images, prompt_ids=None):
        return -jnp.mean(jnp.square(images.astype(jnp.float32)), axis=(1, 2, 3))


def test_draft_plus_training_run(tmp_path):
    from vision_ft_tpu.config import TrainConfig
    from vision_ft_tpu.dataset.text_to_image import TextToImageDatasetConfig
    from vision_ft_tpu.models.autoencoder import AutoencoderKLConfig
    from vision_ft_tpu.models.sdxl.pipeline import SDXLModel
    from vision_ft_tpu.models.sdxl.train_draft_plus import SDXLForDRaFTPlusTraining
    from vision_ft_tpu.models.text_encoders import CLIPTextConfig
    from vision_ft_tpu.trainer import Trainer
    from vision_ft_tpu.utils import safetensors as st

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

    class TinyDRaFTTraining(SDXLForDRaFTPlusTraining):
        def setup_model(self):
            self.model = SDXLModel(
                self.model_config,
                tokenizer=MockTokenizer(),
                vae_config=AutoencoderKLConfig(
                    block_out_channels=(8, 8, 16, 16), latent_channels=4,
                    norm_num_groups=4,
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
            self.model.init_params(jax.random.PRNGKey(0))
            self.reward_models = [_DummyReward()]

    rng = np.random.default_rng(0)
    folder = tmp_path / "data"
    folder.mkdir()
    for i in range(8):
        arr = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(folder / f"img_{i}.png")
        (folder / f"img_{i}.txt").write_text(f"a photo number {i}")

    config = TrainConfig.model_validate(
        {
            "model": {
                "checkpoint_path": "", "dtype": "float32",
                "max_token_length": 75,
                "total_steps": 3, "truncation_steps": 1,
                "cfg_scale": 3.0, "kl_coeff": 1.0,
                "denoiser": {
                    "hidden_dim": 32, "num_head_channels": 8, "context_dim": 64 + 48,
                    "block_out_channels": [32, 64, 64],
                    "num_transformers_per_block": [1, 1, 1],
                },
            },
            "dataset": {
                "folder": str(folder), "batch_size": 8, "bucket_base_size": 64,
                "step": 32, "min_size": 32, "num_repeats": 1,
            },
            "peft": {
                "include_keys": ["attn1", "attn2"],
                "exclude_keys": ["to_out"],
                "config": {"type": "lora", "rank": 2, "alpha": 2.0, "dtype": "float32"},
            },
            "optimizer": {"name": "torch.optim.AdamW", "args": {"lr": 1e-3}},
            "saving": {
                "strategy": {"per_epochs": 1, "per_steps": None},
                "callbacks": [
                    {"type": "safetensors", "name": "draft",
                     "save_dir": str(tmp_path / "out")}
                ],
            },
            "seed": 0,
            "num_train_epochs": 1,
            "trainer": {"gradient_accumulation_steps": 1},
        }
    )
    trainer = Trainer(config)
    trainer.register_train_dataset_class(TextToImageDatasetConfig)
    trainer.register_model_class(TinyDRaFTTraining)
    trainer.train()

    files = sorted((tmp_path / "out").glob("*.safetensors"))
    assert files, "no adapter checkpoint written"
    sd = st.load_file(files[-1])
    ups = [np.asarray(v) for k, v in sd.items() if k.endswith(".lora_up.weight")]
    assert ups and any(np.abs(u).max() > 0 for u in ups), "reward gradient did not train LoRA"
