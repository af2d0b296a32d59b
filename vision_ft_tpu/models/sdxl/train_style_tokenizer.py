"""SDXL style tokenizer training workload.

Behavioral spec: /root/reference/train/sdxl/style_tokenizer.py — both
projectors train (vision encoder frozen by default, base model always
frozen); style tokens are scattered into the text towers' input
embeddings through TextEncoderWithStyle; epsilon-prediction loss with
uniform/gaussian timesteps and random style drop for CFG.
"""

from __future__ import annotations

import os
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image
from PIL.Image import Image as PILImage

from ...config import TrainConfig
from ...models.for_training import ModelForTraining
from ...modules.loss.diffusion import loss_with_predicted_noise, prepare_noised_latents
from ...modules.peft import merge_params
from ...modules.timestep.sampling import gaussian_randint, uniform_randint
from .adapter.style_tokenizer import (
    SDXLModelWithStyleTokenizer,
    SDXLModelWithStyleTokenizerConfig,
)
from .train_text_to_image import _default_tokenizer


class SDXLModelWithStyleTokenizerTrainingConfig(SDXLModelWithStyleTokenizerConfig):
    """(reference style_tokenizer.py:32-40)."""

    max_token_length: int = 225
    drop_image_rate: float = 0.1

    freeze_vision_encoder: bool = True
    freeze_projector: bool = False

    timestep_sampling: Literal["uniform", "gaussian"] = "uniform"
    timestep_sampling_args: dict = {}


class SDXLStyleTokenizerTraining(ModelForTraining):
    model: SDXLModelWithStyleTokenizer
    model_config: SDXLModelWithStyleTokenizerTrainingConfig
    model_config_class = SDXLModelWithStyleTokenizerTrainingConfig

    def __init__(self, trainer, config: TrainConfig, tokenizer=None, image_encoder=None):
        self.tokenizer = tokenizer
        self.image_encoder = image_encoder
        super().__init__(trainer, config)

    def before_setup_model(self) -> None:
        pass

    def setup_model(self) -> None:
        tokenizer = self.tokenizer or _default_tokenizer()
        self.model = SDXLModelWithStyleTokenizer(
            self.model_config, image_encoder=self.image_encoder, tokenizer=tokenizer
        )
        if os.path.exists(self.model_config.checkpoint_path):
            self.model._from_checkpoint()
        else:
            self.model.init_params(jax.random.PRNGKey(self.config.seed))

    def after_setup_model(self) -> None:
        if self.config.trainer.gradient_checkpointing:
            self.model.denoiser.set_gradient_checkpointing(True)

    def trainable_filter(self, path: str) -> bool:
        if self.model_config.freeze_projector:
            return False
        return path.startswith("projector_1.") or path.startswith("projector_2.")

    def get_params(self):
        return self.model.params

    def sanity_check(self) -> None:
        dtype = self.model.dtype
        cfg = self.model.denoiser.config
        latent = jnp.zeros((1, 12, 12, cfg.in_channels), dtype)
        context = jnp.zeros((1, 77, cfg.context_dim), dtype)
        out = self.model.denoiser(
            self.model.params["denoiser"], latent, jnp.array([50.0]), context,
            jnp.zeros((1, 1280), dtype), jnp.full((1, 2), 96.0),
            jnp.full((1, 2), 96.0), jnp.zeros((1, 2)),
        )
        assert out.shape == latent.shape

    # -- data ----------------------------------------------------------------------

    def preprocess_batch(self, batch: dict) -> dict:
        from ...modules.long_prompt import tokenize_long_prompt
        from .text_encoder import CHUNK_LENGTH

        te = self.model.text_encoder
        captions = [
            te.escape_exclamation(te.preprocess_style_token(c))
            for c in batch["caption"]
        ]
        ids, _ = tokenize_long_prompt(
            te.tokenizer, captions,
            max_length=self.model_config.max_token_length, chunk_length=CHUNK_LENGTH,
        )
        pixel_values = np.asarray(batch["image"], np.float32)
        reference = np.asarray(batch["reference_image"], np.float32)

        batch_size = pixel_values.shape[0]
        drop_image = (
            np.random.rand(batch_size) < self.model_config.drop_image_rate
        ).astype(np.float32)
        if self.model.vision_encoder is None:
            self.model.vision_encoder = self.model._default_image_encoder()
        features = np.asarray(self.model.vision_encoder(reference), np.float32)

        return {
            "pixel_values": pixel_values,
            "input_ids": np.asarray(ids),
            "original_size": np.asarray(batch["original_size"], np.float32),
            "target_size": np.asarray(batch["target_size"], np.float32),
            "crop_coords_top_left": np.asarray(batch["crop_coords_top_left"], np.float32),
            "reference_features": features,
            "drop_image": drop_image,
        }

    # -- loss -----------------------------------------------------------------------

    def loss_fn(self, trainable, frozen, batch, key):
        params = merge_params(frozen, trainable)
        model = self.model
        dtype = model.dtype
        cfg = self.model_config
        batch_size = batch["pixel_values"].shape[0]
        k_vae, k_t, k_noise = jax.random.split(key, 3)

        # 1. style tokens (trainable projectors — gradients DO flow through
        #    the text encoder activations into the projectors, like the
        #    reference where only torch.no_grad wraps the VAE, :186-195)
        features = batch["reference_features"].astype(jnp.float32)
        tokens_1 = model.projector_1(
            jax.tree.map(lambda x: x.astype(jnp.float32), params["projector_1"]),
            features,
        ).style_tokens
        tokens_2 = model.projector_2(
            jax.tree.map(lambda x: x.astype(jnp.float32), params["projector_2"]),
            features,
        ).style_tokens
        drop = (1.0 - batch["drop_image"])[:, None, None]
        tokens_1 = tokens_1 * drop
        tokens_2 = tokens_2 * drop

        emb1, emb2, pooled = model.text_encoder.encode_tokens_with_style(
            params["text_encoder"], batch["input_ids"], batch_size,
            style_embeddings_1=tokens_1.astype(dtype),
            style_embeddings_2=tokens_2.astype(dtype),
        )
        context = jnp.concatenate([emb1, emb2], axis=-1).astype(dtype)
        pooled = pooled.astype(dtype)

        dist = model.vae.encode(params["vae"], batch["pixel_values"].astype(dtype))
        latents = jax.lax.stop_gradient(
            (dist.sample(k_vae) * model.vae.scaling_factor).astype(dtype)
        )

        args = cfg.timestep_sampling_args
        if cfg.timestep_sampling == "uniform":
            timesteps = uniform_randint(
                k_t, latents.shape,
                args.get("min_timesteps", 0), args.get("max_timesteps", 1000),
            )
        else:
            timesteps = gaussian_randint(
                k_t, latents.shape,
                args.get("min_timesteps", 0), args.get("max_timesteps", 1000),
                args.get("mean", 100), args.get("std", 100),
            )

        noisy_latents, random_noise = prepare_noised_latents(k_noise, latents, timesteps)
        noise_pred = model.denoiser(
            params["denoiser"], noisy_latents, timesteps.astype(jnp.float32),
            context, pooled, batch["original_size"], batch["target_size"],
            batch["crop_coords_top_left"],
        )
        loss = loss_with_predicted_noise(latents, random_noise, noise_pred)
        return loss, {}

    def eval_step(self, batch):
        raise NotImplementedError

    def preview_step(self, batch: dict, preview_index: int) -> list[PILImage]:
        negative_prompt = batch["negative_prompt"]
        if negative_prompt is None and batch["cfg_scale"] > 0:
            negative_prompt = ""
        reference = None
        extra = batch.get("extra") or {}
        if path := extra.get("reference_image_path"):
            reference = Image.open(path).convert("RGB")
        image = self.model.generate(
            prompt=batch["prompt"], negative_prompt=negative_prompt,
            reference_image=reference, height=batch["height"], width=batch["width"],
            cfg_scale=batch["cfg_scale"], num_inference_steps=batch["num_steps"],
            seed=batch["seed"], max_token_length=self.model_config.max_token_length,
        )[0]
        return [image]

    def get_state_dict_to_save(self):
        return self.model.adapter_state_dict()

    def get_metadata_to_save(self) -> dict[str, str]:
        return {
            "projector_type": self.model_config.adapter.projector_type,
            "num_style_tokens": str(self.model_config.adapter.num_style_tokens),
            "style_token": self.model_config.adapter.style_token,
        }
