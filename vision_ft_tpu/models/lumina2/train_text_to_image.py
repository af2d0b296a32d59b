"""Lumina2 text-to-image training workload.

Behavioral spec: /root/reference/train/lumina2/text_to_image.py — flow
matching with Lumina2's INVERTED timesteps (t=1 clean: noising uses
1 - t, velocity target is negated), timestep sampling
uniform / lognorm / shift_fraction_uniform, optional 4x-downsampled
auxiliary losses, frozen Gemma-2 + VAE, comfy-key LoRA export.
"""

from __future__ import annotations

import os
from typing import Literal

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
from ...modules.timestep.sampling import shift_fraction_uniform_rand, uniform_rand
from .config import Lumina2Config
from .pipeline import Lumina2
from .util import convert_to_comfy_key


class Lumina2ForTextToImageTrainingConfig(Lumina2Config):
    max_token_length: int = 256

    timestep_sampling: Literal["uniform", "lognorm", "shift_fraction_uniform"] = "uniform"
    timestep_fraction_divisible: list[int] = [20, 25, 30, 32]

    use_lowres_loss: bool = True
    use_downsampled_velocity_loss: bool = False


def _avg_pool_4x(x: jax.Array) -> jax.Array:
    """4x4 average pool over NHWC (reference downsample_4x on NCHW)."""
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 4, 4, 1), (1, 4, 4, 1), "VALID"
    ) / 16.0


class Lumina2ForTextToImageTraining(ModelForTraining):
    model: Lumina2
    model_config: Lumina2ForTextToImageTrainingConfig
    model_config_class = Lumina2ForTextToImageTrainingConfig

    def __init__(self, trainer, config: TrainConfig, tokenizer=None) -> None:
        self.tokenizer = tokenizer
        super().__init__(trainer, config)

    def before_setup_model(self) -> None:
        pass

    def setup_model(self) -> None:
        if os.path.exists(self.model_config.checkpoint_path):
            self.model = Lumina2.from_checkpoint(self.model_config, tokenizer=self.tokenizer)
        else:
            self.model = Lumina2(self.model_config, tokenizer=self.tokenizer)
            self.model.init_params(jax.random.PRNGKey(self.config.seed))

    def after_setup_model(self) -> None:
        if self.config.trainer.gradient_checkpointing:
            self.model.denoiser.set_gradient_checkpointing(True)

    def sanity_check(self) -> None:
        cfg = self.model.denoiser.config
        dtype = self.model.dtype
        latent = jnp.zeros((1, 8, 8, cfg.in_channels), dtype)
        captions = jnp.zeros((1, 16, cfg.caption_dim), dtype)
        mask = jnp.ones((1, 16), bool)
        velocity, _, _ = self.model.denoiser(
            self.model.params["denoiser"], latent, captions, jnp.array([0.1], dtype), mask
        )
        assert velocity.shape == latent.shape

    def preprocess_batch(self, batch: dict) -> dict:
        ids, mask = self.model.text_encoder.tokenize(
            list(batch["caption"]), self.model_config.max_token_length
        )
        return {
            "pixel_values": np.asarray(batch["image"], np.float32),
            "input_ids": np.asarray(ids),
            "attention_mask": np.asarray(mask),
        }

    def _sample_timesteps(self, key, latents_shape):
        mode = self.model_config.timestep_sampling
        if mode == "uniform":
            return uniform_rand(key, latents_shape)
        if mode == "lognorm":
            return self.model.scheduler.sample_sigmoid_randn(
                key, latents_shape, patch_size=self.model.denoiser.patch_size
            )
        if mode == "shift_fraction_uniform":
            return 1 - shift_fraction_uniform_rand(
                key,
                latents_shape,
                shift=self.model.scheduler.shift,
                divisible=self.model_config.timestep_fraction_divisible,
            )
        raise ValueError(f"Unknown timestep sampling method: {mode}")

    def _forward_and_loss(self, params, latents, timesteps, captions, caption_mask, key):
        # invert: Lumina2's t=1 is clean (reference :99-121)
        noisy_latents, random_noise = prepare_noised_latents(key, latents, 1 - timesteps)
        velocity_pred, _, _ = self.model.denoiser(
            params["denoiser"],
            noisy_latents,
            captions,
            timesteps.astype(latents.dtype),
            caption_mask,
        )
        velocity_pred = -velocity_pred  # Lumina2 predicts latents - noise
        loss = loss_with_predicted_velocity(latents, random_noise, velocity_pred)
        target = random_noise - latents
        return loss, velocity_pred, target

    def loss_fn(self, trainable, frozen, batch, key):
        params = merge_params(frozen, trainable)
        model = self.model
        dtype = model.dtype
        k_vae, k_t, k_hi, k_lo = jax.random.split(key, 4)

        hidden = model.text_encoder.encode_tokens(
            params["text_encoder"], batch["input_ids"], batch["attention_mask"]
        )
        hidden = jax.lax.stop_gradient(hidden.astype(dtype))
        caption_mask = batch["attention_mask"].astype(bool)

        dist = model.vae.encode(params["vae"], batch["pixel_values"].astype(dtype))
        latents = (dist.sample(k_vae) - model.vae.shift_factor) * model.vae.scaling_factor
        latents = jax.lax.stop_gradient(latents.astype(dtype))

        timesteps = self._sample_timesteps(k_t, latents.shape)

        loss, velocity, target = self._forward_and_loss(
            params, latents, timesteps, hidden, caption_mask, k_hi
        )
        metrics = {"train/highres_loss": loss}
        total = loss

        if self.model_config.use_lowres_loss:
            lo_loss, _, _ = self._forward_and_loss(
                params, _avg_pool_4x(latents), timesteps, hidden, caption_mask, k_lo
            )
            total = total + lo_loss
            metrics["train/lowres_loss"] = lo_loss

        if self.model_config.use_downsampled_velocity_loss:
            small_v = _avg_pool_4x(velocity).astype(jnp.float32)
            small_t = _avg_pool_4x(target).astype(jnp.float32)
            v_loss = jnp.mean(jnp.square(small_v - small_t))
            total = total + v_loss
            metrics["train/downsampled_velocity_loss"] = v_loss

        return total, metrics

    def eval_step(self, batch):
        raise NotImplementedError

    def preview_step(self, batch: dict, preview_index: int) -> list[Image]:
        negative_prompt = batch["negative_prompt"]
        if negative_prompt is None and batch["cfg_scale"] > 0:
            negative_prompt = ""
        image = self.model.generate(
            prompt=batch["prompt"],
            negative_prompt=negative_prompt,
            height=batch["height"],
            width=batch["width"],
            cfg_scale=batch["cfg_scale"],
            num_inference_steps=batch["num_steps"],
            seed=batch["seed"],
            max_token_length=self.model_config.max_token_length,
        )[0]
        return [image]

    def get_state_dict_to_save(self):
        if not self._is_peft:
            return self.model.state_dict()
        state_dict = get_adapter_parameters(self.model.params)
        return {convert_to_comfy_key(k): v for k, v in state_dict.items()}
