"""SDXL Prompt-Free Generation (PFG) training workloads.

Behavioral specs:
  /root/reference/train/sdxl/prompt_free.ref.py  — paired reference image
    mode: projector tokens concatenated to the text context; random image
    drop; uniform/gaussian timesteps; projector-only trainable.
  /root/reference/train/sdxl/prompt_free.self.py — the target image is
    its own reference (+ optional LoRA on the base via config.peft).

The frozen vision encoder runs host-side in ``preprocess_batch``; only
the projector traces into the jitted loss.
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
from ...modules.peft import get_adapter_parameters, merge_params
from ...modules.timestep.sampling import gaussian_randint, uniform_randint
from .adapter.prompt_free import SDXLModelWithPFG, SDXLModelWithPFGConfig
from .train_text_to_image import _default_tokenizer
from .util import convert_to_comfy_key


class SDXLModelWithPFGTrainingConfig(SDXLModelWithPFGConfig):
    """(reference prompt_free.ref.py:29-37)."""

    max_token_length: int = 75
    drop_image_rate: float = 0.1

    freeze_vision_encoder: bool = True

    timestep_sampling: Literal["uniform", "gaussian"] = "uniform"
    timestep_sampling_args: dict = {}


class SDXLPFGTraining(ModelForTraining):
    """Reference-image mode (prompt_free.ref.py)."""

    model: SDXLModelWithPFG
    model_config: SDXLModelWithPFGTrainingConfig
    model_config_class = SDXLModelWithPFGTrainingConfig

    self_reference: bool = False

    def __init__(self, trainer, config: TrainConfig, tokenizer=None, image_encoder=None):
        self.tokenizer = tokenizer
        self.image_encoder = image_encoder
        super().__init__(trainer, config)

    def before_setup_model(self) -> None:
        pass

    def setup_model(self) -> None:
        tokenizer = self.tokenizer or _default_tokenizer()
        self.model = SDXLModelWithPFG(
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
        # projector trains; base model only via LoRA (handled by the PEFT
        # split when config.peft is set — reference prompt_free.self.py)
        return path.startswith("projector.")

    def get_params(self):
        return self.model.params

    def sanity_check(self) -> None:
        dtype = self.model.dtype
        cfg = self.model.denoiser.config
        n_tok = self.model_config.adapter.num_image_tokens
        latent = jnp.zeros((1, 12, 12, cfg.in_channels), dtype)
        context = jnp.zeros((1, 77 + n_tok, cfg.context_dim), dtype)
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

        captions = [
            self.model.text_encoder.escape_exclamation(c) for c in batch["caption"]
        ]
        ids, _ = tokenize_long_prompt(
            self.model.text_encoder.tokenizer, captions,
            max_length=self.model_config.max_token_length, chunk_length=CHUNK_LENGTH,
        )
        pixel_values = np.asarray(batch["image"], np.float32)
        if self.self_reference:
            images = [
                Image.fromarray(((np.clip(im, -1, 1) + 1) / 2 * 255).astype(np.uint8))
                for im in pixel_values
            ]
            reference = self.model.preprocess_reference_image(images)
        else:
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

        features = batch["reference_features"].astype(dtype)
        image_tokens = model.projector(params["projector"], features).image_tokens
        image_tokens = image_tokens * (1.0 - batch["drop_image"])[:, None, None]
        # tokens ride the context tail (reference prompt_free.ref.py:178-186)
        context = jnp.concatenate([context, image_tokens.astype(dtype)], axis=1)

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
        state_dict = self.model.adapter_state_dict()
        if self._is_peft:
            peft = get_adapter_parameters(self.model.params)
            state_dict.update(
                {convert_to_comfy_key(k): v for k, v in peft.items()}
            )
        return state_dict

    def get_metadata_to_save(self) -> dict[str, str]:
        return {
            "projector_type": self.model_config.adapter.projector_type,
            "num_image_tokens": str(self.model_config.adapter.num_image_tokens),
        }


class SDXLPFGSelfTraining(SDXLPFGTraining):
    """Self-reference mode (prompt_free.self.py)."""

    self_reference = True
