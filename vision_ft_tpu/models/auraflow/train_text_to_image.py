"""AuraFlow text-to-image training workload (flow matching).

Behavioral spec: /root/reference/train/auraflow/text_to_image.py — sigmoid
timestep sampling, rectified-flow velocity MSE, frozen UMT5 + VAE, comfy
key LoRA export. TPU split mirrors the SDXL workload: host tokenization in
``preprocess_batch``, pure ``loss_fn`` jitted per bucket shape.
"""

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
from .config import AuraFlowConig
from .pipeline import AuraFlowModel
from .text_encoder import DEFAULT_MAX_TOKEN_LENGTH
from .util import convert_to_comfy_key


class AuraFlowForTextToImageTraining(ModelForTraining):
    model: AuraFlowModel
    model_config: AuraFlowConig
    model_config_class = AuraFlowConig

    def __init__(self, trainer, config: TrainConfig, tokenizer=None) -> None:
        self.tokenizer = tokenizer
        super().__init__(trainer, config)

    def before_setup_model(self) -> None:
        pass

    def setup_model(self) -> None:
        if os.path.exists(self.model_config.checkpoint_path):
            self.model = AuraFlowModel.from_original_checkpoint(
                self.model_config, tokenizer=self.tokenizer
            )
        else:
            self.model = AuraFlowModel(self.model_config, tokenizer=self.tokenizer)
            self.model.init_params(jax.random.PRNGKey(self.config.seed))

    def after_setup_model(self) -> None:
        if self.config.trainer.gradient_checkpointing:
            self.model.denoiser.set_gradient_checkpointing(True)

    def sanity_check(self) -> None:
        dtype = self.model.dtype
        cfg = self.model.denoiser.config
        latent = jnp.zeros((1, 8, 8, cfg.in_channels), dtype)
        prompt = jnp.zeros((1, 6, cfg.joint_attention_dim), dtype)
        out = self.model.denoiser(
            self.model.params["denoiser"], latent, prompt, jnp.array([0.5], dtype)
        )
        assert out.shape == latent.shape

    def preprocess_batch(self, batch: dict) -> dict:
        ids, mask = self.model.text_encoder.tokenize(
            list(batch["caption"]), DEFAULT_MAX_TOKEN_LENGTH
        )
        return {
            "pixel_values": np.asarray(batch["image"], np.float32),
            "input_ids": np.asarray(ids),
            "attention_mask": np.asarray(mask),
        }

    def loss_fn(self, trainable, frozen, batch, key):
        params = merge_params(frozen, trainable)
        model = self.model
        dtype = model.dtype
        k_vae, k_t, k_noise = jax.random.split(key, 3)

        hidden, _ = model.text_encoder.encode_tokens(
            params["text_encoder"], batch["input_ids"], batch["attention_mask"]
        )
        hidden = jax.lax.stop_gradient(hidden.astype(dtype))

        dist = model.vae.encode(params["vae"], batch["pixel_values"].astype(dtype))
        latents = dist.sample(k_vae) * model.vae.scaling_factor
        latents = jax.lax.stop_gradient(latents.astype(dtype))

        timesteps = sigmoid_randn(k_t, latents.shape)
        noisy_latents, random_noise = prepare_noised_latents(k_noise, latents, timesteps)

        velocity_pred = model.denoiser(
            params["denoiser"],
            noisy_latents,
            hidden,
            timesteps.astype(dtype),
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
            prompt=batch["prompt"],
            negative_prompt=negative_prompt,
            height=batch["height"],
            width=batch["width"],
            cfg_scale=batch["cfg_scale"],
            num_inference_steps=batch["num_steps"],
            seed=batch["seed"],
        )[0]
        return [image]

    def get_state_dict_to_save(self):
        if not self._is_peft:
            return self.model.state_dict()
        state_dict = get_adapter_parameters(self.model.params)
        return {convert_to_comfy_key(k): v for k, v in state_dict.items()}
