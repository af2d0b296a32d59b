"""AuraFlow learned-PE -> RoPE migration training workload.

Behavioral spec: /root/reference/train/auraflow/rope_migration.py — the
denoiser carries BOTH positional systems; a single learnable scalar
(MigrationScaleFromZero) blends identity-rotation frequencies toward real
RoPE while fading the learned positional encoding out:

    rope_freqs = base - s * (base - rope)      (base = no rotation)
    patches   += (1 - s) * learned_pos_encoding

with losses: flow-match velocity MSE, a pull of s toward 1, and an
optional prior-preservation MSE against the RoPE-disabled adapter-off
prediction (rope_migration.py:248-305).
"""

from __future__ import annotations

import os
from contextlib import contextmanager
from typing import Literal, Optional

import jax
import jax.numpy as jnp

from ...modules.loss.flow_match import (
    loss_with_predicted_velocity,
    prepare_noised_latents,
)
from ...modules.migration.scale import MigrationScaleFromZero
from ...modules.peft import get_adapter_parameters, merge_params, while_peft_disabled
from ...modules.timestep.sampling import sigmoid_randn, uniform_rand
from .config import AuraFlowConig
from .denoiser import Denoiser
from .pipeline import AuraFlowModel
from .train_text_to_image import AuraFlowForTextToImageTraining
from .util import convert_to_comfy_key


class DenoiserForRoPEMigration(Denoiser):
    """(reference DenoiserForRoPEMigration, rope_migration.py:31-145):
    keeps the learned PE in the tree, blends it against RoPE through the
    migration scale. ``use_rope``/``migration`` are static trace-time
    flags (toggle + re-jit, like the PEFT/RoPE toggles elsewhere)."""

    def __init__(self, config) -> None:
        config = config.model_copy(update={"use_rope": True})
        super().__init__(config)
        self.use_rope = True
        self.migration = True
        self.migration_scale = MigrationScaleFromZero(dim=1)

    def _position_encoding(self, params, patches, cond_len, height, width):
        if not self.use_rope:
            return (
                patches
                + self.get_pos_encoding(params, height, width).astype(patches.dtype),
                None,
            )
        rope_freqs = self._rope_freqs(cond_len, height, width)
        if self.migration:
            ms = params["migration_scale"]
            base = jnp.ones_like(rope_freqs)
            base = base.at[..., 1].set(0.0)  # cos=1, sin=0: no rotation
            rope_freqs = base - self.migration_scale.scale_positive(
                ms, base - rope_freqs
            )
            patches = patches + self.migration_scale.scale_negative(
                ms, self.get_pos_encoding(params, height, width)
            ).astype(patches.dtype)
        return patches, rope_freqs


class AuraFlowForRoPEMigration(AuraFlowModel):
    denoiser: DenoiserForRoPEMigration
    denoiser_class = DenoiserForRoPEMigration

    @contextmanager
    def while_rope_disabled(self):
        tmp = self.denoiser.use_rope
        self.denoiser.use_rope = False
        try:
            yield
        finally:
            self.denoiser.use_rope = tmp

    @contextmanager
    def while_migration_disabled(self):
        tmp = self.denoiser.migration
        self.denoiser.migration = False
        try:
            yield
        finally:
            self.denoiser.migration = tmp


class AuraFlowForRoPEMigrationConfig(AuraFlowConig):
    """(reference rope_migration.py:166-173)."""

    noise_prediction_loss: bool = True
    migration_loss: bool = True
    prior_preservation_loss: bool = False

    migration_freezing_threshold: Optional[float] = 1e-7
    timestep_sampling: Literal["sigmoid", "uniform"] = "sigmoid"


class AuraFlowForRoPEMigrationTraining(AuraFlowForTextToImageTraining):
    model: AuraFlowForRoPEMigration
    model_config: AuraFlowForRoPEMigrationConfig
    model_config_class = AuraFlowForRoPEMigrationConfig

    def setup_model(self) -> None:
        assert self.model_config.denoiser.use_rope, (
            "This model is not for positional attention training"
        )
        if os.path.exists(self.model_config.checkpoint_path):
            self.model = AuraFlowForRoPEMigration.from_original_checkpoint(
                self.model_config, tokenizer=self.tokenizer
            )
        else:
            self.model = AuraFlowForRoPEMigration(
                self.model_config, tokenizer=self.tokenizer
            )
            self.model.init_params(jax.random.PRNGKey(self.config.seed))
        dn = self.model.denoiser
        # the scale always (re)initializes at zero (reference scale.py:41-55)
        self.model.params["denoiser"]["migration_scale"] = dn.migration_scale.init(
            jax.random.PRNGKey(0)
        )
        if self.model_config.migration_loss:
            dn.migration_scale.freezing_threshold = (
                self.model_config.migration_freezing_threshold
            )
        else:
            # migration disabled: lock the blend at full RoPE
            dn.migration = False
            dn.migration_scale.freezing_threshold = 2.0
            self.model.params["denoiser"]["migration_scale"]["scale"] = jnp.ones_like(
                self.model.params["denoiser"]["migration_scale"]["scale"]
            )

    def peft_extra_trainable_filter(self, path: str) -> bool:
        return (
            self.model_config.migration_loss
            and path.startswith("denoiser.migration_scale.")
        )

    def trainable_filter(self, path: str) -> bool:
        if path.startswith("denoiser.migration_scale."):
            return self.model_config.migration_loss
        return path.startswith("denoiser.")

    def sanity_check(self) -> None:
        dtype = self.model.dtype
        cfg = self.model.denoiser.config
        latent = jnp.zeros((1, 8, 8, cfg.in_channels), dtype)
        prompt = jnp.zeros((1, 6, cfg.joint_attention_dim), dtype)
        out = self.model.denoiser(
            self.model.params["denoiser"], latent, prompt, jnp.array([0.5], dtype)
        )
        assert out.shape == latent.shape

    def loss_fn(self, trainable, frozen, batch, key):
        cfg = self.model_config
        params = merge_params(frozen, trainable)
        model = self.model
        dtype = model.dtype
        k_vae, k_t, k_noise = jax.random.split(key, 3)

        hidden, _ = model.text_encoder.encode_tokens(
            params["text_encoder"], batch["input_ids"], batch["attention_mask"]
        )
        hidden = jax.lax.stop_gradient(hidden.astype(dtype))
        dist = model.vae.encode(params["vae"], batch["pixel_values"].astype(dtype))
        latents = jax.lax.stop_gradient(
            (dist.sample(k_vae) * model.vae.scaling_factor).astype(dtype)
        )

        if cfg.timestep_sampling == "sigmoid":
            timesteps = sigmoid_randn(k_t, latents.shape)
        else:
            timesteps = uniform_rand(k_t, latents.shape)
        noisy_latents, random_noise = prepare_noised_latents(k_noise, latents, timesteps)

        velocity_pred = model.denoiser(
            params["denoiser"], noisy_latents, hidden, timesteps.astype(dtype)
        )
        scale = model.denoiser.migration_scale.inner_scale(
            params["denoiser"]["migration_scale"]
        )

        total = jnp.float32(0.0)
        logs: dict = {"rope_scale": jnp.mean(scale)}
        if cfg.noise_prediction_loss:
            l2 = loss_with_predicted_velocity(latents, random_noise, velocity_pred)
            logs["l2_loss"] = l2
            total = total + l2
        if cfg.migration_loss:
            mig = jnp.mean(jnp.square(scale - 1.0))
            logs["rope_migration_loss"] = mig
            total = total + mig
        if cfg.prior_preservation_loss:
            with while_peft_disabled(), model.while_rope_disabled():
                preserved = jax.lax.stop_gradient(
                    model.denoiser(
                        params["denoiser"], noisy_latents, hidden,
                        timesteps.astype(dtype),
                    )
                )
            ppl = jnp.mean(
                jnp.square(
                    preserved.astype(jnp.float32) - velocity_pred.astype(jnp.float32)
                )
            )
            logs["ppl_loss"] = ppl
            total = total + ppl
        return total, logs

    def get_state_dict_to_save(self):
        if not self._is_peft:
            return self.model.state_dict()
        state_dict = get_adapter_parameters(self.model.params)
        state_dict["denoiser.migration_scale.scale"] = self.model.params["denoiser"][
            "migration_scale"
        ]["scale"]
        return {convert_to_comfy_key(k): v for k, v in state_dict.items()}
