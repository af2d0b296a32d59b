"""End-to-end Trainer run: tiny SDXL + LoRA on the 8-device CPU mesh.

Covers: config validation, dataset wiring, PEFT setup, jitted grad/apply
loop with gradient accumulation, saving callback cadence + comfy-key LoRA
export, debug modes.
"""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from vision_ft_tpu.config import TrainConfig
from vision_ft_tpu.dataset.text_to_image import TextToImageDatasetConfig
from vision_ft_tpu.models.autoencoder import AutoencoderKLConfig
from vision_ft_tpu.models.sdxl.pipeline import SDXLModel
from vision_ft_tpu.models.sdxl.train_text_to_image import SDXLForTextToImageTraining
from vision_ft_tpu.models.text_encoders import CLIPTextConfig
from vision_ft_tpu.nn import flatten_params
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


class TinySDXLTraining(SDXLForTextToImageTraining):
    def setup_model(self):
        self.model = SDXLModel(
            self.model_config,
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
        self.model.init_params(jax.random.PRNGKey(0))

    def preview_step(self, batch, preview_index):
        return super().preview_step(batch, preview_index)


@pytest.fixture
def data_folder(tmp_path):
    rng = np.random.default_rng(0)
    folder = tmp_path / "data"
    folder.mkdir()
    for i in range(16):
        arr = rng.integers(0, 255, (96, 96, 3), dtype=np.uint8)
        Image.fromarray(arr).save(folder / f"img_{i}.png")
        (folder / f"img_{i}.txt").write_text(f"a photo number {i}")
    return folder


def _make_config(tmp_path, data_folder, **overrides):
    config = {
        "model": {
            "checkpoint_path": "",
            "dtype": "float32",
            "max_token_length": 75,
            "denoiser": {
                "hidden_dim": 32,
                "num_head_channels": 8,
                "context_dim": 64 + 48,
                "block_out_channels": [32, 64, 64],
                "num_transformers_per_block": [1, 1, 1],
            },
        },
        "dataset": {
            "folder": str(data_folder),
            "batch_size": 8,
            "bucket_base_size": 64,
            "step": 32,
            "min_size": 32,
            "num_repeats": 1,
        },
        "peft": {
            "include_keys": ["attn1", "attn2"],
            "exclude_keys": ["to_out"],
            "config": {"type": "lora", "rank": 4, "alpha": 4.0, "dtype": "float32"},
        },
        "optimizer": {"name": "torch.optim.AdamW", "args": {"lr": 1e-3}},
        "saving": {
            "strategy": {"per_epochs": 1, "per_steps": None},
            "callbacks": [
                {"type": "safetensors", "name": "lora", "save_dir": str(tmp_path / "out")}
            ],
        },
        "seed": 0,
        "num_train_epochs": 2,
        "trainer": {"gradient_accumulation_steps": 2},
    }
    config.update(overrides)
    return TrainConfig.model_validate(config)


def test_full_lora_training_run(tmp_path, data_folder):
    config = _make_config(tmp_path, data_folder)
    trainer = Trainer(config)
    trainer.register_train_dataset_class(TextToImageDatasetConfig)
    trainer.register_model_class(TinySDXLTraining)
    trainer.train()

    # adapter-only checkpoint in comfy key layout was written each epoch
    files = sorted((tmp_path / "out").glob("*.safetensors"))
    assert len(files) == 2  # per_epochs=1 x 2 epochs
    sd = st.load_file(files[-1])
    assert len(sd) > 0
    assert all(k.startswith(("diffusion_model.", "clip_l.", "clip_g.")) for k in sd)
    assert any(k.endswith(".lora_down.weight") for k in sd)
    assert any(k.endswith(".alpha") for k in sd)
    # up weights trained away from zero
    ups = [np.asarray(v) for k, v in sd.items() if k.endswith(".lora_up.weight")]
    assert any(np.abs(u).max() > 0 for u in ups)
    # base weights unchanged in the live model (frozen)
    flat = flatten_params(trainer.model.get_params())
    assert "denoiser.input_blocks.blocks.0.0.weight" in flat


def test_ema_training_run(tmp_path, data_folder):
    """trainer.ema_decay: EMA updates after every optimizer step, lags the
    live iterate, and is what the saving path exports."""
    config = _make_config(
        tmp_path, data_folder, num_train_epochs=1,
        trainer={"gradient_accumulation_steps": 1, "ema_decay": 0.5},
    )
    trainer = Trainer(config)
    trainer.register_train_dataset_class(TextToImageDatasetConfig)
    trainer.register_model_class(TinySDXLTraining)
    trainer.train()

    assert trainer.ema_params is not None
    live = flatten_params(trainer.trainable)
    ema = flatten_params(trainer.ema_params)
    # fp32 accumulator regardless of param dtype: at decay 0.999+ a bf16
    # EMA increment rounds to zero and the average never moves
    assert all(v.dtype == jnp.float32 for v in ema.values())
    assert live.keys() == ema.keys()
    # EMA trails the live iterate (decay 0.5 over a couple of steps from a
    # zero-init lora_up start: ema magnitude strictly between 0 and live)
    moved = [
        k for k in live
        if "lora_up" in k and float(jnp.abs(np.asarray(live[k])).max()) > 0
    ]
    assert moved
    k = moved[0]
    assert 0 < float(jnp.abs(ema[k]).max()) < float(jnp.abs(live[k]).max())

    # saving exported the EMA weights, not the live iterate
    files = sorted((tmp_path / "out").glob("*.safetensors"))
    sd = st.load_file(files[-1])
    comfy_ups = {kk: v for kk, v in sd.items() if kk.endswith(".lora_up.weight")}
    ema_ups = sorted(
        float(jnp.abs(ema[kk]).max()) for kk in live if kk.endswith("lora_up.weight")
        or kk.endswith("up.weight")
    )
    saved_ups = sorted(float(np.abs(v).max()) for v in comfy_ups.values())
    live_ups = sorted(
        float(jnp.abs(live[kk]).max()) for kk in live if kk.endswith("lora_up.weight")
        or kk.endswith("up.weight")
    )
    assert saved_ups == pytest.approx(ema_ups, rel=1e-6)
    assert saved_ups != pytest.approx(live_ups, rel=1e-6)


def test_ema_math_unit():
    from vision_ft_tpu.training.state_checkpoint import (
        restore_train_state,
        save_train_state,
    )

    # ema checkpoint round trip incl. the pre-EMA fallback
    tree = {"w": jnp.ones((2, 2))}
    opt = {"mu": jnp.zeros((2, 2))}
    ema = {"w": jnp.full((2, 2), 0.5)}
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        save_train_state(d, 3, tree, opt, ema=ema)
        step, t, o, e = restore_train_state(d, tree, opt, ema_like=ema)
        assert step == 3
        np.testing.assert_allclose(np.asarray(e["w"]), 0.5)
    with tempfile.TemporaryDirectory() as d:
        save_train_state(d, 5, tree, opt)  # no ema in the checkpoint
        step, t, o, e = restore_train_state(d, tree, opt, ema_like=ema)
        assert step == 5
        np.testing.assert_allclose(np.asarray(e["w"]), 1.0)  # seeded from trainable


def test_full_finetune_trains_denoiser_only(tmp_path, data_folder):
    config = _make_config(
        tmp_path, data_folder, peft=None, num_train_epochs=1,
        trainer={"debug_mode": "1step", "gradient_accumulation_steps": 1},
        saving=None,
    )
    trainer = Trainer(config)
    trainer.register_train_dataset_class(TextToImageDatasetConfig)
    trainer.register_model_class(TinySDXLTraining)
    trainer.train()
    t_keys = flatten_params(trainer.trainable).keys()
    assert all(k.startswith("denoiser.") for k in t_keys)
    f_keys = flatten_params(trainer.frozen).keys()
    assert any(k.startswith("text_encoder.") for k in f_keys)
    assert any(k.startswith("vae.") for k in f_keys)


def test_debug_modes(tmp_path, data_folder, capsys):
    for mode in ("sanity_check", "dataset"):
        config = _make_config(
            tmp_path, data_folder, num_train_epochs=1,
            trainer={"debug_mode": mode},
            saving=None,
        )
        trainer = Trainer(config)
        trainer.register_train_dataset_class(TextToImageDatasetConfig)
        trainer.register_model_class(TinySDXLTraining)
        trainer.train()
    out = capsys.readouterr().out
    assert "Sanity check done" in out
    assert "Dataset check done" in out


def test_cached_latents_and_text_embeddings(tmp_path, data_folder):
    config = _make_config(
        tmp_path, data_folder,
        model={
            "checkpoint_path": "", "dtype": "float32", "max_token_length": 75,
            "cache_latents": True, "cache_text_embeddings": True,
            "denoiser": {
                "hidden_dim": 32, "num_head_channels": 8, "context_dim": 64 + 48,
                "block_out_channels": [32, 64, 64],
                "num_transformers_per_block": [1, 1, 1],
            },
        },
    )
    trainer = Trainer(config)
    trainer.register_train_dataset_class(TextToImageDatasetConfig)
    trainer.register_model_class(TinySDXLTraining)
    trainer.train()
    # caches populated; text cache hit on epoch 2 (16 unique captions)
    assert len(trainer.model._text_cache) == 16
    assert len(trainer.model._latent_cache) >= 16
    files = sorted((tmp_path / "out").glob("*.safetensors"))
    assert files
    sd = st.load_file(files[-1])
    ups = [np.asarray(v) for k, v in sd.items() if k.endswith(".lora_up.weight")]
    assert any(np.abs(u).max() > 0 for u in ups)


def test_state_checkpoint_save_and_resume(tmp_path, data_folder):
    ckpt_dir = str(tmp_path / "state")
    config = _make_config(
        tmp_path, data_folder,
        num_train_epochs=1,
        trainer={
            "gradient_accumulation_steps": 1,
            "state_checkpoint_dir": ckpt_dir,
            "state_checkpoint_every_steps": 1,
        },
    )
    trainer = Trainer(config)
    trainer.register_train_dataset_class(TextToImageDatasetConfig)
    trainer.register_model_class(TinySDXLTraining)
    trainer.train()

    from vision_ft_tpu.training.state_checkpoint import (
        latest_checkpoint_step,
        restore_train_state,
    )

    last = latest_checkpoint_step(ckpt_dir)
    assert last is not None and last >= 1

    # a fresh trainer restores the step counter and the trained params
    trainer2 = Trainer(config)
    trainer2.register_train_dataset_class(TextToImageDatasetConfig)
    trainer2.register_model_class(TinySDXLTraining)
    trainer2.before_train()
    restored = restore_train_state(ckpt_dir, trainer2.trainable, trainer2.opt_state)
    assert restored is not None
    step0, trainable, _opt = restored
    assert step0 == last
    trained = flatten_params(trainer.trainable)
    loaded = flatten_params(trainable)
    for k in trained:
        np.testing.assert_array_equal(np.asarray(trained[k]), np.asarray(loaded[k]))


def test_dataloader_prefetch_matches_sync(tmp_path, data_folder):
    from vision_ft_tpu.dataloader import DataLoader, concatnate_collate_fn

    class SlowDataset:
        def __len__(self):
            return 12

        def __getitem__(self, i):
            import time

            time.sleep(0.01)
            return {"x": np.full((2, 3), i, np.float32), "caption": [f"c{i}"]}

    sync = DataLoader(SlowDataset(), shuffle=True, seed=7,
                      collate_fn=concatnate_collate_fn, num_workers=0)
    threaded = DataLoader(SlowDataset(), shuffle=True, seed=7,
                          collate_fn=concatnate_collate_fn, num_workers=4)
    sync.set_epoch(3)
    threaded.set_epoch(3)
    a = list(sync)
    b = list(threaded)
    assert len(a) == len(b) == 12
    for ba, bb in zip(a, b):
        np.testing.assert_array_equal(ba["x"], bb["x"])
        assert ba["caption"] == bb["caption"]
