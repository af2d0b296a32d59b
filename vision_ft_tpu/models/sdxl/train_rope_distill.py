"""SDXL RoPE distillation training workload.

Behavioral spec: /root/reference/train/sdxl/rope_distill.py — teach a
RoPE-retrofit student (usually via LoRA) to match the frozen positional-
embedding-free teacher (the SAME weights with RoPE and PEFT disabled),
with four weighted loss terms: epsilon-prediction L2, teacher-distill
MSE, and low-resolution variants of both on bicubically downscaled
pixels (rope_distill.py:39-48, 169-342).

Both teacher and student forwards trace into ONE jitted program: the
enable toggles are Python trace-time context managers (teacher traced
with adapters+RoPE off and fenced by stop_gradient, the analogue of the
reference's inference_mode + while_peft_disabled + while_rope_disabled,
rope_distill.py:205-222).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ...modules.loss.diffusion import loss_with_predicted_noise, prepare_noised_latents
from ...modules.peft import merge_params, while_peft_disabled
from ...modules.timestep.sampling import uniform_randint
from .adapter.rope import SDXLWithRoPEConfig, SDXLWithRoPEModel, while_rope_disabled
from .train_text_to_image import SDXLForTextToImageTraining, _default_tokenizer


class SDXLForRoPEDistillTrainingConfig(SDXLWithRoPEConfig):
    """(reference rope_distill.py:39-48)."""

    max_token_length: int = 225  # 75 * 3

    l2_loss_weight: float = 1.0
    distill_loss_weight: float = 1.0

    lowres_l2_loss_weight: float = 0.0
    lowres_distill_loss_weight: float = 1.0

    lowres_ratio: float = 2.0


class SDXLForRoPEDistillTraining(SDXLForTextToImageTraining):
    model: SDXLWithRoPEModel
    model_config: SDXLForRoPEDistillTrainingConfig
    model_config_class = SDXLForRoPEDistillTrainingConfig

    def setup_model(self) -> None:
        import os

        tokenizer = self.tokenizer or _default_tokenizer()
        # force RoPE enabled for the student (reference rope_distill.py:59)
        self.model_config.denoiser.rope_enabled = True
        if os.path.exists(self.model_config.checkpoint_path):
            self.model = SDXLWithRoPEModel.from_checkpoint(
                self.model_config, tokenizer=tokenizer
            )
        else:
            self.model = SDXLWithRoPEModel(self.model_config, tokenizer=tokenizer)
            self.model.init_params(jax.random.PRNGKey(self.config.seed))

    def _downscale(self, pixel_values, original_size, target_size, crop_coords):
        """Bicubic in-graph downscale (the reference uses torchvision
        antialiased bicubic, rope_distill.py:143-167)."""
        ratio = self.model_config.lowres_ratio
        b, h, w, c = pixel_values.shape
        new_h, new_w = math.ceil(h / ratio), math.ceil(w / ratio)
        lowres = jax.image.resize(
            pixel_values.astype(jnp.float32), (b, new_h, new_w, c), method="cubic"
        ).astype(pixel_values.dtype)
        return (
            lowres,
            jnp.ceil(original_size / ratio),
            jnp.ceil(target_size / ratio),
            jnp.floor(crop_coords / ratio),
        )

    def loss_fn(self, trainable, frozen, batch, key):
        cfg = self.model_config
        model = self.model
        dtype = model.dtype
        params = merge_params(frozen, trainable)
        batch_size = batch["pixel_values"].shape[0]
        k_vae, k_t, k_noise, k_vae2, k_noise2 = jax.random.split(key, 5)

        # 1. frozen encoders
        emb1, emb2, pooled = model.text_encoder.encode_tokens(
            params["text_encoder"], batch["input_ids"], batch["input_ids"], batch_size
        )
        context = jax.lax.stop_gradient(
            jnp.concatenate([emb1, emb2], axis=-1).astype(dtype)
        )
        pooled = jax.lax.stop_gradient(pooled.astype(dtype))

        dist = model.vae.encode(params["vae"], batch["pixel_values"].astype(dtype))
        latents = jax.lax.stop_gradient(
            (dist.sample(k_vae) * model.vae.scaling_factor).astype(dtype)
        )
        timesteps = uniform_randint(k_t, latents.shape, 0, 1000)
        noisy_latents, random_noise = prepare_noised_latents(k_noise, latents, timesteps)

        def denoise(noisy, osize, tsize, ccoords):
            return model.denoiser(
                params["denoiser"], noisy, timesteps.astype(jnp.float32),
                context, pooled, osize, tsize, ccoords,
            )

        sizes = (
            batch["original_size"], batch["target_size"], batch["crop_coords_top_left"]
        )

        logs: dict = {}
        total = jnp.float32(0.0)

        # 2. teacher (RoPE off, adapters off, no grads —
        #    reference rope_distill.py:204-222)
        if cfg.distill_loss_weight > 0:
            with while_peft_disabled(), while_rope_disabled():
                teacher_pred = jax.lax.stop_gradient(denoise(noisy_latents, *sizes))

        # 3. student (RoPE on)
        student_pred = denoise(noisy_latents, *sizes)

        if cfg.l2_loss_weight > 0:
            l2 = loss_with_predicted_noise(latents, random_noise, student_pred)
            logs["l2_loss"] = l2
            total = total + l2 * cfg.l2_loss_weight
        if cfg.distill_loss_weight > 0:
            distill = jnp.mean(
                jnp.square(
                    student_pred.astype(jnp.float32) - teacher_pred.astype(jnp.float32)
                )
            )
            logs["distill_loss"] = distill
            total = total + distill * cfg.distill_loss_weight

        # 4. low-res terms (reference rope_distill.py:239-288)
        if cfg.lowres_l2_loss_weight > 0 or cfg.lowres_distill_loss_weight > 0:
            lr_pixels, lr_osize, lr_tsize, lr_ccoords = self._downscale(
                batch["pixel_values"].astype(dtype), *sizes
            )
            lr_dist = model.vae.encode(params["vae"], lr_pixels)
            lr_latents = jax.lax.stop_gradient(
                (lr_dist.sample(k_vae2) * model.vae.scaling_factor).astype(dtype)
            )
            lr_noisy, lr_noise = prepare_noised_latents(k_noise2, lr_latents, timesteps)
            lr_student = denoise(lr_noisy, lr_osize, lr_tsize, lr_ccoords)

            if cfg.lowres_distill_loss_weight > 0:
                with while_peft_disabled(), while_rope_disabled():
                    lr_teacher = jax.lax.stop_gradient(
                        denoise(lr_noisy, lr_osize, lr_tsize, lr_ccoords)
                    )
                lr_distill = jnp.mean(
                    jnp.square(
                        lr_student.astype(jnp.float32) - lr_teacher.astype(jnp.float32)
                    )
                )
                logs["lowres_distill_loss"] = lr_distill
                total = total + lr_distill * cfg.lowres_distill_loss_weight
            if cfg.lowres_l2_loss_weight > 0:
                lr_l2 = loss_with_predicted_noise(lr_latents, lr_noise, lr_student)
                logs["lowres_l2_loss"] = lr_l2
                total = total + lr_l2 * cfg.lowres_l2_loss_weight

        return total, logs
