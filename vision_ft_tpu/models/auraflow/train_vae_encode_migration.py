"""AuraFlow VAE-encoder migration training workload.

Behavioral spec: /root/reference/train/auraflow/vae_encode_migration.py —
migrate the MMDiT's patch input from the 4-channel AuraFlow (SDXL) VAE to
the 16-channel Flux VAE. The ``init_x_linear`` grows zero-padded input
columns (4ch*p*p -> 16ch*p*p, reference PatchEncoder.prepare_migration,
:54-74); old-VAE patches are zero-padded to the new width so both encode
paths feed the same projection; a per-feature MigrationScaleFromZero
blends them:

    mixed = (1 - s) * sg(aura_patches) + s * flux_patches
    loss  = MSE(aura_patches, mixed) + MSE(s, 1)

Only the migration scale trains (reference :317-330)."""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...modules.migration.scale import MigrationScaleFromZero
from ...modules.patch import patchify
from ...modules.peft import get_adapter_parameters, merge_params
from ..autoencoder import AutoencoderKL
from ..flux.vae import FLUX_VAE_CONFIG
from ..for_training import ModelForTraining
from .config import AuraFlowConig
from .train_text_to_image import AuraFlowForTextToImageTraining
from .util import convert_to_comfy_key
from .vae import DEFAULT_VAE_CONFIG as AURA_VAE_CONFIG

FLUX_VAE_SCALING_FACTOR = 0.3611
FLUX_VAE_SHIFT_FACTOR = 0.1159
AURA_VAE_SCALING_FACTOR = 0.13025


class AuraFlowForVAEEncoderMigrationConfig(AuraFlowConig):
    """(reference vae_encode_migration.py:103-115)."""

    prior_preservation_loss: bool = True
    migration_loss: bool = True

    migration_freezing_threshold: Optional[float] = 1e-7

    flux_vae_repo_name: str = "black-forest-labs/FLUX.1-schnell"
    flux_vae_subfolder: str = "vae"
    vae_dtype: str = "bf16"

    patch_size: int = 2
    latent_channels: int = 16


def extend_init_x_linear(
    init_x_linear: dict, new_in_features: int
) -> dict:
    """Zero-pad the projection's input columns (reference
    PatchEncoder.prepare_migration, :54-74): weight (out, old_in) ->
    (out, new_in) with zeros in the new columns; bias unchanged."""
    weight = init_x_linear["weight"]
    out_dim, old_in = weight.shape
    new_weight = jnp.zeros((out_dim, new_in_features), weight.dtype)
    new_weight = new_weight.at[:, :old_in].set(weight)
    return {**init_x_linear, "weight": new_weight}


def pad_patches(patches: jax.Array, new_dim: int) -> jax.Array:
    """Zero-pad the feature dim (reference pad_patches, :76-97)."""
    pad = new_dim - patches.shape[-1]
    return jnp.pad(patches, ((0, 0), (0, 0), (0, pad)))


class AuraFlowForVAEEncoderMigrationTraining(AuraFlowForTextToImageTraining):
    model_config: AuraFlowForVAEEncoderMigrationConfig
    model_config_class = AuraFlowForVAEEncoderMigrationConfig

    def setup_model(self) -> None:
        cfg = self.model_config
        self.aura_vae = AutoencoderKL(AURA_VAE_CONFIG)
        self.flux_vae = AutoencoderKL(FLUX_VAE_CONFIG)
        self.patch_size = cfg.patch_size
        self.latent_channels = cfg.latent_channels
        self.new_patch_dim = cfg.patch_size**2 * cfg.latent_channels
        self.migration_scale = MigrationScaleFromZero(
            dim=self.new_patch_dim,
            freezing_threshold=cfg.migration_freezing_threshold,
        )

        inner_dim = cfg.denoiser.attention_head_dim * cfg.denoiser.num_attention_heads
        old_in = cfg.denoiser.patch_size**2 * cfg.denoiser.in_channels
        key = jax.random.PRNGKey(self.config.seed)
        k_aura, k_flux, k_lin = jax.random.split(key, 3)
        from ...nn import Linear

        init_x_linear = Linear(old_in, inner_dim).init(k_lin)
        if os.path.exists(cfg.checkpoint_path):
            # only init_x_linear loads from the denoiser checkpoint
            from ...utils import safetensors as st
            from .util import convert_from_original_key

            sd = st.load_file(cfg.checkpoint_path)
            lin = {
                convert_from_original_key(k).split(".")[-1]: v
                for k, v in sd.items()
                if "init_x_linear" in k
            }
            if lin:
                init_x_linear = lin

        self.params = {
            "aura_vae": self.aura_vae.init(k_aura),
            "flux_vae": self.flux_vae.init(k_flux),
            "denoiser": {
                "init_x_linear": extend_init_x_linear(
                    init_x_linear, self.new_patch_dim
                )
            },
            "migration_scale": self.migration_scale.init(jax.random.PRNGKey(0)),
        }
        self.model = self  # this workload has no pipeline model

    # ModelForTraining surface -------------------------------------------------

    def get_params(self):
        return self.params

    def set_params(self, params) -> None:
        self.params = params

    def trainable_filter(self, path: str) -> bool:
        return path.startswith("migration_scale.")

    def peft_extra_trainable_filter(self, path: str) -> bool:
        return path.startswith("migration_scale.")

    def after_setup_model(self) -> None:
        pass

    def sanity_check(self) -> None:
        img = jnp.zeros((1, 64, 64, 3), jnp.float32)
        former = self.encode_aura_vae(self.params, img)
        latter = self.encode_flux_vae(self.params, img)
        assert former.shape == latter.shape

    def preprocess_batch(self, batch: dict) -> dict:
        return {"pixel_values": np.asarray(batch["image"], np.float32)}

    # encode paths ---------------------------------------------------------------

    def encode_aura_vae(self, params, image: jax.Array) -> jax.Array:
        dist = self.aura_vae.encode(params["aura_vae"], image)
        latent = dist.mode() * AURA_VAE_SCALING_FACTOR
        return pad_patches(patchify(latent, self.patch_size), self.new_patch_dim)

    def encode_flux_vae(self, params, image: jax.Array) -> jax.Array:
        dist = self.flux_vae.encode(params["flux_vae"], image)
        latent = (dist.mode() - FLUX_VAE_SHIFT_FACTOR) * FLUX_VAE_SCALING_FACTOR
        return patchify(latent, self.patch_size)

    # loss -------------------------------------------------------------------------

    def loss_fn(self, trainable, frozen, batch, key):
        cfg = self.model_config
        params = merge_params(frozen, trainable)
        image = batch["pixel_values"]

        former = jax.lax.stop_gradient(self.encode_aura_vae(params, image))
        scaled_former = jax.lax.stop_gradient(
            self.migration_scale.scale_negative(params["migration_scale"], former)
        )
        latter = self.encode_flux_vae(params, image)

        scale = self.migration_scale.inner_scale(params["migration_scale"])
        mixed = scaled_former + self.migration_scale.scale_positive(
            params["migration_scale"], latter
        )

        total = jnp.float32(0.0)
        logs: dict = {"scale_mean": jnp.mean(scale)}
        if cfg.prior_preservation_loss:
            ppl = jnp.mean(
                jnp.square(former.astype(jnp.float32) - mixed.astype(jnp.float32))
            )
            logs["ppl_loss"] = ppl
            total = total + ppl
        if cfg.migration_loss:
            mig = jnp.mean(jnp.square(scale - 1.0))
            logs["migration_loss"] = mig
            total = total + mig
        return total, logs

    def eval_step(self, batch):
        raise NotImplementedError

    def preview_step(self, batch, preview_index):
        return []

    def get_state_dict_to_save(self):
        from ...nn import flatten_params

        state_dict = {
            f"denoiser.init_x_linear.{k}": v
            for k, v in self.params["denoiser"]["init_x_linear"].items()
        }
        state_dict["migration_scale.scale"] = self.params["migration_scale"]["scale"]
        if self._is_peft:
            state_dict.update(get_adapter_parameters(self.params))
        return {convert_to_comfy_key(k): v for k, v in state_dict.items()}
