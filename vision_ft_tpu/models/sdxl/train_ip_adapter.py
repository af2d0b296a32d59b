"""SDXL IP-Adapter training workloads.

Behavioral specs:
  /root/reference/train/sdxl/ip_adapter.ref.py  — reference-image mode:
    ip tokens from a paired reference image, concatenated to the text
    context (the context-tail variants consume them there); random image
    drop for CFG; uniform/gaussian integer timesteps.
  /root/reference/train/sdxl/ip_adapter.self.py — self-reference mode: the
    target image doubles as the reference; optional token tail-drop with a
    key-mask; ip tokens pass through cross_attention_kwargs.

Trainable split: adapter projections (+ gates/norms) and the image
projector train; base UNet/text encoders/VAE/image encoder stay frozen.
"""

from __future__ import annotations

import os
from typing import Literal, Optional

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
from .adapter.ip_adapter import (
    SDXLModelWithIPAdapter,
    SDXLModelWithIPAdapterConfig,
    VARIANT_CLASSES,
)
from .train_text_to_image import _default_tokenizer

_ADAPTER_LEAVES = tuple(
    {name for cls in VARIANT_CLASSES.values() for name in cls.adapter_param_names}
)


class SDXLModelWithIPAdapterTrainingConfig(SDXLModelWithIPAdapterConfig):
    max_token_length: int = 225

    timestep_sampling: Literal["uniform", "gaussian"] = "uniform"
    timestep_sampling_args: dict = {}

    drop_image_rate: float = 0.0

    # self-reference mode extras (ip_adapter.self.py:40-43)
    token_tail_drop: bool = False
    token_tail_drop_rate: float = 0.5
    token_tail_drop_sampling: Literal["uniform"] = "uniform"


class SDXLIPAdapterTraining(ModelForTraining):
    """Reference-image mode (ip_adapter.ref.py)."""

    model: SDXLModelWithIPAdapter
    model_config: SDXLModelWithIPAdapterTrainingConfig
    model_config_class = SDXLModelWithIPAdapterTrainingConfig

    self_reference: bool = False
    # ref mode rides the context tail; self/kyara modes pass ip tokens
    # through cross_attention_kwargs (with optional token tail-drop)
    tokens_via_cross_attention: bool = False

    def __init__(self, trainer, config: TrainConfig, tokenizer=None, image_encoder=None):
        self.tokenizer = tokenizer
        self.image_encoder = image_encoder
        super().__init__(trainer, config)

    def before_setup_model(self) -> None:
        pass

    def setup_model(self) -> None:
        tokenizer = self.tokenizer or _default_tokenizer()
        self.model = SDXLModelWithIPAdapter(
            self.model_config, image_encoder=self.image_encoder, tokenizer=tokenizer
        )
        if os.path.exists(self.model_config.checkpoint_path):
            self.model._from_checkpoint()
        else:
            self.model.init_params(jax.random.PRNGKey(self.config.seed))
        self.model.init_adapter_params(jax.random.PRNGKey(self.config.seed + 1))
        if self.model_config.adapter.checkpoint_weight:
            from ...utils import safetensors as st

            self.model.load_adapter_params(
                st.load_file(self.model_config.adapter.checkpoint_weight)
            )

    def after_setup_model(self) -> None:
        if self.config.trainer.gradient_checkpointing:
            self.model.denoiser.set_gradient_checkpointing(True)

    def trainable_filter(self, path: str) -> bool:
        if path.startswith("image_proj."):
            return True
        # adapter leaves directly under an attn2 (plain "norm"/"gate" names
        # also exist elsewhere in the UNet — require the attn2 parent)
        parts = path.split(".")
        for leaf in _ADAPTER_LEAVES:
            if leaf in parts:
                idx = parts.index(leaf)
                if idx > 0 and parts[idx - 1] == "attn2":
                    return True
        return False

    def get_params(self):
        return self.model.params

    def sanity_check(self) -> None:
        dtype = self.model.dtype
        cfg = self.model.denoiser.config
        n_tok = self.model_config.adapter.num_ip_tokens
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
            # self mode: the target image is the reference
            images = [
                Image.fromarray(
                    ((np.clip(im, -1, 1) + 1) / 2 * 255).astype(np.uint8)
                )
                for im in pixel_values
            ]
            reference = self.model.preprocess_reference_image(images)
        else:
            reference = np.asarray(batch["reference_image"], np.float32)

        # host-side randomness: image drop + tail drop (reference uses torch
        # rand / np.random on the host too)
        batch_size = pixel_values.shape[0]
        drop_image = (
            np.random.rand(batch_size) < self.model_config.drop_image_rate
        ).astype(np.float32)

        # the frozen image encoder runs host-side (it may be a torch/timm
        # model); only the trainable projector runs inside the jitted loss
        features = np.asarray(self.model.encoder(reference), np.float32)

        out = {
            "pixel_values": pixel_values,
            "input_ids": np.asarray(ids),
            "original_size": np.asarray(batch["original_size"], np.float32),
            "target_size": np.asarray(batch["target_size"], np.float32),
            "crop_coords_top_left": np.asarray(batch["crop_coords_top_left"], np.float32),
            "reference_features": features,
            "drop_image": drop_image,
        }

        self._tokens_to_keep = None
        if self.tokens_via_cross_attention and self.model_config.token_tail_drop:
            if np.random.rand() < self.model_config.token_tail_drop_rate:
                self._tokens_to_keep = int(
                    np.random.randint(1, self.model_config.adapter.num_ip_tokens + 1)
                )
        return out

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
        ip_tokens = model.image_proj(params["image_proj"], features, context)
        ip_tokens = ip_tokens * (1.0 - batch["drop_image"])[:, None, None]

        cross_attention_kwargs = None
        if self.tokens_via_cross_attention:
            ip_mask = None
            if self._tokens_to_keep is not None:
                keep = self._tokens_to_keep
                ip_tokens = ip_tokens[:, :keep, :]
                ip_mask = jnp.ones((batch_size, keep), bool)
            cross_attention_kwargs = {"ip_tokens": ip_tokens, "ip_mask": ip_mask}
        else:
            # ref mode: tokens ride the context tail (reference :177-184)
            context = jnp.concatenate([context, ip_tokens], axis=1)

        noisy_latents, random_noise = prepare_noised_latents(k_noise, latents, timesteps)
        noise_pred = model.denoiser(
            params["denoiser"], noisy_latents, timesteps.astype(jnp.float32),
            context, pooled, batch["original_size"], batch["target_size"],
            batch["crop_coords_top_left"],
            cross_attention_kwargs=cross_attention_kwargs,
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
        return self.model.get_adapter_state_dict()

    def get_metadata_to_save(self) -> dict[str, str]:
        return {
            "projector_type": self.model_config.adapter.projector_type,
            "variant": self.model_config.adapter.variant,
            "num_ip_tokens": str(self.model_config.adapter.num_ip_tokens),
        }


class SDXLIPAdapterSelfTraining(SDXLIPAdapterTraining):
    """Self-reference mode (ip_adapter.self.py)."""

    self_reference = True
    tokens_via_cross_attention = True


class SDXLIPAdapterKyaraTraining(SDXLIPAdapterTraining):
    """Kyara mode (ip_adapter.kyara.py): dataset-provided cropped
    character references (already normalized by the Kyara dataset), ip
    tokens through cross_attention_kwargs with token tail-drop, no random
    image drop."""

    self_reference = False
    tokens_via_cross_attention = True
