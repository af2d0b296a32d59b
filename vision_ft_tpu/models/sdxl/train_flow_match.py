"""SDXL flow-match conversion training workload.

Behavioral spec: /root/reference/train/sdxl/flow_match.py — retargets the
epsilon UNet to rectified flow: scale_shift_sigmoid (or any) timestep
sampler x1000, scaled noising with clean_at_zero control, velocity or
image prediction with velocity/image loss types.
"""

from __future__ import annotations

from typing import Literal

import jax
import jax.numpy as jnp

from ...modules.loss.flow_match import (
    ModelPredictionType,
    convert_x0_to_velocity,
    loss_with_predicted_velocity,
    prepare_scaled_noised_latents,
)
from ...modules.peft import merge_params
from ...modules.timestep.sampling import TimestepSamplingType, sample_timestep
from .adapter.flow_match import SDXLFlowMatch, SDXLFlowMatchConfig
from .train_text_to_image import SDXLForTextToImageTraining, _default_tokenizer


class SDXLForFlowMatchingTrainingConfig(SDXLFlowMatchConfig):
    max_token_length: int = 225

    loss_type: ModelPredictionType = "velocity"

    timestep_sampling: TimestepSamplingType = "scale_shift_sigmoid"
    timestep_std: float = 0.8
    timestep_mean: float = -0.8


class SDXLForFlowMatchingTraining(SDXLForTextToImageTraining):
    model: SDXLFlowMatch
    model_config: SDXLForFlowMatchingTrainingConfig
    model_config_class = SDXLForFlowMatchingTrainingConfig

    def setup_model(self) -> None:
        import os

        tokenizer = self.tokenizer or _default_tokenizer()
        if os.path.exists(self.model_config.checkpoint_path):
            self.model = SDXLFlowMatch.from_checkpoint(self.model_config, tokenizer=tokenizer)
        else:
            self.model = SDXLFlowMatch(self.model_config, tokenizer=tokenizer)
            self.model.init_params(jax.random.PRNGKey(self.config.seed))

    def _treat_loss(self, model_pred, latents, random_noise, noisy_latents, timestep):
        cfg = self.model_config
        if cfg.model_prediction == "velocity":
            if cfg.loss_type == "velocity":
                return loss_with_predicted_velocity(latents, random_noise, model_pred)
            raise NotImplementedError(
                f"loss_type {cfg.loss_type} not implemented for velocity prediction"
            )
        if cfg.model_prediction == "image":
            if cfg.loss_type == "velocity":
                target_v = convert_x0_to_velocity(
                    latents, noisy_latents, timestep,
                    eps=cfg.timestep_eps, clean_at_zero=cfg.clean_at_zero,
                )
                v_pred = convert_x0_to_velocity(
                    model_pred, noisy_latents, timestep,
                    eps=cfg.timestep_eps, clean_at_zero=cfg.clean_at_zero,
                )
                return jnp.mean(
                    jnp.square(v_pred.astype(jnp.float32) - target_v.astype(jnp.float32))
                )
            if cfg.loss_type == "image":
                return jnp.mean(
                    jnp.square(
                        model_pred.astype(jnp.float32)
                        - jax.lax.stop_gradient(latents).astype(jnp.float32)
                    )
                )
            raise NotImplementedError(
                f"loss_type {cfg.loss_type} not implemented for image prediction"
            )
        raise ValueError(f"Unknown model_prediction: {cfg.model_prediction}")

    def loss_fn(self, trainable, frozen, batch, key):
        params = merge_params(frozen, trainable)
        model = self.model
        dtype = model.dtype
        cfg = self.model_config
        k_vae, k_t, k_noise = jax.random.split(key, 3)

        emb1, emb2, pooled = model.text_encoder.encode_tokens(
            params["text_encoder"], batch["input_ids"], batch["input_ids"],
            batch["pixel_values"].shape[0],
        )
        context = jax.lax.stop_gradient(
            jnp.concatenate([emb1, emb2], axis=-1).astype(dtype)
        )
        pooled = jax.lax.stop_gradient(pooled.astype(dtype))

        dist = model.vae.encode(params["vae"], batch["pixel_values"].astype(dtype))
        latents = jax.lax.stop_gradient(
            (dist.sample(k_vae) * model.vae.scaling_factor).astype(dtype)
        )

        sampler_kwargs = {}
        if cfg.timestep_sampling == "scale_shift_sigmoid":
            sampler_kwargs = {"std": cfg.timestep_std, "mean": cfg.timestep_mean}
        elif cfg.timestep_sampling == "shift_sigmoid":
            sampler_kwargs = {"discrete_flow_shift": 3.1825, "sigmoid_scale": 1}
        timesteps = (
            sample_timestep(k_t, latents.shape, cfg.timestep_sampling, **sampler_kwargs)
            * 1000.0
        )

        noisy_latents, random_noise = prepare_scaled_noised_latents(
            k_noise, latents, timesteps / 1000.0,
            noise_scale=cfg.noise_scale, clean_at_zero=cfg.clean_at_zero,
        )

        model_pred = model.denoiser(
            params["denoiser"],
            noisy_latents,
            timesteps,
            context,
            pooled,
            batch["original_size"],
            batch["target_size"],
            batch["crop_coords_top_left"],
        )
        loss = self._treat_loss(
            model_pred, latents, random_noise, noisy_latents, timesteps / 1000.0
        )
        return loss, {}
