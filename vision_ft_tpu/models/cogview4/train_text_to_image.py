"""CogView4 text-to-image training workload (reference
train/cogview4/text_to_image.py): sigmoid timestep sampling + standard
flow-match velocity MSE, frozen GLM + VAE."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from PIL.Image import Image

from ...config import TrainConfig
from ...models.for_training import ModelForTraining
from ...modules.loss.flow_match import (
    loss_with_predicted_velocity,
    prepare_noised_latents,
)
from ...modules.peft import get_adapter_parameters, merge_params
from ...modules.timestep.sampling import sigmoid_randn
from .config import CogView4Config
from .pipeline import CogView4Model, convert_to_comfy_key
from .text_encoder import DEFAULT_MAX_TOKEN_LENGTH


class CogView4ForTextToImageTraining(ModelForTraining):
    model: CogView4Model
    model_config: CogView4Config
    model_config_class = CogView4Config

    def __init__(self, trainer, config: TrainConfig, tokenizer=None) -> None:
        self.tokenizer = tokenizer
        super().__init__(trainer, config)

    def before_setup_model(self) -> None:
        pass

    def setup_model(self) -> None:
        if os.path.exists(self.model_config.checkpoint_path):
            self.model = CogView4Model.from_checkpoint(self.model_config, tokenizer=self.tokenizer)
        else:
            self.model = CogView4Model(self.model_config, tokenizer=self.tokenizer)
            self.model.init_params(jax.random.PRNGKey(self.config.seed))

    def after_setup_model(self) -> None:
        if self.config.trainer.gradient_checkpointing:
            self.model.denoiser.set_gradient_checkpointing(True)

    def sanity_check(self) -> None:
        cfg = self.model.denoiser.config
        dtype = self.model.dtype
        latent = jnp.zeros((1, 8, 8, cfg.in_channels), dtype)
        prompt = jnp.zeros((1, 16, cfg.text_embed_dim), dtype)
        out = self.model.denoiser(
            self.model.params["denoiser"], latent, prompt, jnp.array([0.5], dtype),
            jnp.full((1, 2), 64.0), jnp.full((1, 2), 64.0), jnp.zeros((1, 2)),
        )
        assert out.shape == latent.shape

    def preprocess_batch(self, batch: dict) -> dict:
        out = self.model.text_encoder.tokenizer(
            list(batch["caption"]), max_length=DEFAULT_MAX_TOKEN_LENGTH,
            padding="longest", truncation=True,
        )
        ids = np.asarray(out["input_ids"], np.int32)
        pad_length = 16 - (ids.shape[1] % 16)
        if pad_length < 16:
            pad_id = getattr(self.model.text_encoder.tokenizer, "pad_token_id", 0) or 0
            ids = np.concatenate(
                [np.full((ids.shape[0], pad_length), pad_id, np.int32), ids], axis=1
            )
        return {
            "pixel_values": np.asarray(batch["image"], np.float32),
            "input_ids": ids,
            "original_size": np.asarray(batch["original_size"], np.float32),
            "target_size": np.asarray(batch["target_size"], np.float32),
            "crop_coords_top_left": np.asarray(batch["crop_coords_top_left"], np.float32),
        }

    def loss_fn(self, trainable, frozen, batch, key):
        params = merge_params(frozen, trainable)
        model = self.model
        dtype = model.dtype
        k_vae, k_t, k_noise = jax.random.split(key, 3)

        hidden = model.text_encoder.encode_tokens(params["text_encoder"], batch["input_ids"])
        hidden = jax.lax.stop_gradient(hidden.astype(dtype))

        dist = model.vae.encode(params["vae"], batch["pixel_values"].astype(dtype))
        latents = jax.lax.stop_gradient(
            (dist.sample(k_vae) * model.vae.scaling_factor).astype(dtype)
        )

        timesteps = sigmoid_randn(k_t, latents.shape)
        noisy_latents, random_noise = prepare_noised_latents(k_noise, latents, timesteps)

        velocity_pred = model.denoiser(
            params["denoiser"], noisy_latents, hidden, timesteps.astype(dtype),
            batch["original_size"], batch["target_size"], batch["crop_coords_top_left"],
        )
        loss = loss_with_predicted_velocity(latents, random_noise, velocity_pred)
        return loss, {}

    def eval_step(self, batch):
        raise NotImplementedError

    def preview_step(self, batch: dict, preview_index: int) -> list[Image]:
        negative_prompt = batch["negative_prompt"]
        if negative_prompt is None and batch["cfg_scale"] > 0:
            negative_prompt = ""
        image = self.model.generate(
            prompt=batch["prompt"], negative_prompt=negative_prompt,
            height=batch["height"], width=batch["width"],
            cfg_scale=batch["cfg_scale"], num_inference_steps=batch["num_steps"],
            seed=batch["seed"],
        )[0]
        return [image]

    def get_state_dict_to_save(self):
        if not self._is_peft:
            return self.model.state_dict()
        state_dict = get_adapter_parameters(self.model.params)
        return {convert_to_comfy_key(k): v for k, v in state_dict.items()}
