"""AuraFlow shortcut-model training workload.

Behavioral spec: /root/reference/train/auraflow/shortcut.py — each batch
splits into a flow-matching group (t from a uniform 1/128..128/128 grid,
duration 1/128) and a self-consistency group (power-of-two durations;
targets = average of two half-duration bootstrap predictions from the
CURRENT model, cfg-scaled); the shortcut embedder is zero-initialized so
the base flow behavior is untouched at step 0, and it stays fully
trainable even under LoRA (shortcut.py:46-54, 294-305).

Static-shape delta: the reference routes the two groups through separate
denoiser calls with data-dependent sizes (shortcut.py:448-487); here both
target kinds are computed for the FULL batch and blended per-sample with
the bernoulli mask — identical math, fixed shapes, two extra no-grad
forwards.
"""

from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from PIL.Image import Image

from ...modules.loss.flow_match import (
    get_flow_match_target_velocity,
    prepare_noised_latents,
)
from ...modules.loss.shortcut import (
    get_shortcut_target_velocity,
    prepare_random_shortcut_durations,
    prepare_self_consistency_targets,
)
from ...modules.peft import get_adapter_parameters, merge_params
from .config import AuraFlowConig
from .denoiser import Denoiser
from .pipeline import AuraFlowModel
from .train_text_to_image import AuraFlowForTextToImageTraining
from .util import convert_to_comfy_key


class DenoiserForShortcut(Denoiser):
    """Denoiser with a zero-initialized shortcut embedder (reference
    DenoiserForShortcut, shortcut.py:39-54). ``use_shortcut`` is forced on
    so the embedder exists in the param tree."""

    def __init__(self, config) -> None:
        config = config.model_copy(update={"use_shortcut": True})
        super().__init__(config)

    @staticmethod
    def reset_shortcut_params(denoiser_params: dict) -> dict:
        """Zero both MLP layers (reference reset_weights, shortcut.py:46-54)."""
        mlp = denoiser_params.get("shortcut_embedder", {}).get("mlp")
        if mlp is None:
            raise KeyError("denoiser has no shortcut_embedder subtree")
        for sub in ("0", "2"):
            mlp[sub]["weight"] = jnp.zeros_like(mlp[sub]["weight"])
            mlp[sub]["bias"] = jnp.zeros_like(mlp[sub]["bias"])
        return denoiser_params


class AuraFlowForShortcut(AuraFlowModel):
    """(reference AuraFlowForShortcut, shortcut.py:154-249)."""

    denoiser_class = DenoiserForShortcut

    def generate(
        self,
        prompt,
        negative_prompt=None,
        width: int = 768,
        height: int = 768,
        num_inference_steps: int = 20,
        cfg_scale: float = 1.0,
        seed=None,
        max_token_length: int = 256,
        do_offloading: bool = False,
    ) -> list[Image.Image]:
        from functools import partial

        do_cfg = cfg_scale > 1.0
        timesteps = np.arange(1000, 0, -1000 / num_inference_steps)
        delta = 1.0 / num_inference_steps
        batch_size = len(prompt) if isinstance(prompt, (list, tuple)) else 1

        encoder_output = self.text_encoder.encode_prompts(
            self.params["text_encoder"], prompt, negative_prompt,
            use_negative_prompts=do_cfg, max_token_length=max_token_length,
        )
        embeddings = jnp.concatenate(
            [encoder_output.positive_embeddings, encoder_output.negative_embeddings]
        ).astype(self.dtype)

        latents = self.prepare_latents(batch_size, height, width, seed=seed)

        def step(params, latents, t, embeddings, scale, do_cfg: bool):
            model_input = jnp.concatenate([latents] * 2) if do_cfg else latents
            b = model_input.shape[0]
            velocity = self.denoiser(
                params, model_input, embeddings,
                jnp.broadcast_to(t, (b,)).astype(latents.dtype),
                shortcut_duration=jnp.full((b,), delta, latents.dtype),
            )
            if do_cfg:
                positive, negative = jnp.split(velocity, 2)
                velocity = negative + scale * (positive - negative)
            return latents - velocity * delta

        from ...nn.core import cached_jit

        jit_step = cached_jit(
            self, f"shortcut_step_{do_cfg}_{delta}", partial(step, do_cfg=do_cfg)
        )
        for t in timesteps:
            latents = jit_step(
                self.params["denoiser"], latents, jnp.float32(t / 1000.0),
                embeddings, jnp.float32(cfg_scale),
            )
        return self.decode_image(latents)


class AuraFlowForShortcutConfig(AuraFlowConig):
    """(reference shortcut.py:252-258)."""

    flow_matching_ratio: float = 0.75
    shortcut_min_steps: int = 1
    shortcut_max_steps: int = 128
    shortcut_cfg_scale: float = 5.0

    timestep_sampling_type: str = "sigmoid"


class AuraFlowForShortcutTraining(AuraFlowForTextToImageTraining):
    model: AuraFlowForShortcut
    model_config: AuraFlowForShortcutConfig
    model_config_class = AuraFlowForShortcutConfig

    def setup_model(self) -> None:
        if os.path.exists(self.model_config.checkpoint_path):
            self.model = AuraFlowForShortcut.from_original_checkpoint(
                self.model_config, tokenizer=self.tokenizer
            )
        else:
            self.model = AuraFlowForShortcut(self.model_config, tokenizer=self.tokenizer)
            self.model.init_params(jax.random.PRNGKey(self.config.seed))
        # base checkpoints carry no shortcut embedder: (re)create it zeroed
        dn = self.model.params["denoiser"]
        if "shortcut_embedder" not in dn:
            dn["shortcut_embedder"] = self.model.denoiser.shortcut_embedder.init(
                jax.random.PRNGKey(self.config.seed), self.model.dtype
            )
        DenoiserForShortcut.reset_shortcut_params(dn)

    def peft_extra_trainable_filter(self, path: str) -> bool:
        return path.startswith("denoiser.shortcut_embedder.")

    def sanity_check(self) -> None:
        dtype = self.model.dtype
        cfg = self.model.denoiser.config
        latent = jnp.zeros((1, 8, 8, cfg.in_channels), dtype)
        prompt = jnp.zeros((1, 6, cfg.joint_attention_dim), dtype)
        out = self.model.denoiser(
            self.model.params["denoiser"], latent, prompt,
            jnp.array([0.5], dtype), shortcut_duration=jnp.array([0.5], dtype),
        )
        assert out.shape == latent.shape
        # zero-initialized embedder must be a no-op at step 0
        emb = self.model.denoiser.shortcut_embedder(
            self.model.params["denoiser"]["shortcut_embedder"], jnp.array([0.5], dtype)
        )
        assert float(jnp.abs(emb).max()) == 0.0

    def loss_fn(self, trainable, frozen, batch, key):
        cfg = self.model_config
        params = merge_params(frozen, trainable)
        model = self.model
        dtype = model.dtype
        k_vae, k_mask, k_fm_t, k_fm_noise, k_sc, k_sc_noise = jax.random.split(key, 6)

        hidden, _ = model.text_encoder.encode_tokens(
            params["text_encoder"], batch["input_ids"], batch["attention_mask"]
        )
        hidden = jax.lax.stop_gradient(hidden.astype(dtype))
        dist = model.vae.encode(params["vae"], batch["pixel_values"].astype(dtype))
        latents = jax.lax.stop_gradient(
            (dist.sample(k_vae) * model.vae.scaling_factor).astype(dtype)
        )
        batch_size = latents.shape[0]

        flow_mask = (
            jax.random.uniform(k_mask, (batch_size,)) <= cfg.flow_matching_ratio
        )

        # flow-matching targets (reference flow_matching_target, :340-391):
        # t from the uniform 1/max..max/max grid, duration 1/max
        max_steps = cfg.shortcut_max_steps
        t_fm = (
            jax.random.randint(k_fm_t, (batch_size,), 1, max_steps + 1).astype(
                jnp.float32
            )
            / max_steps
        )
        d_fm = jnp.full((batch_size,), 1.0 / max_steps, jnp.float32)
        noisy_fm, noise_fm = prepare_noised_latents(k_fm_noise, latents, t_fm)
        target_fm = get_flow_match_target_velocity(latents, noise_fm)

        # shortcut self-consistency targets (reference shortcut_target)
        durations = prepare_random_shortcut_durations(
            k_sc, batch_size,
            min_pow=int(math.log2(cfg.shortcut_min_steps)),
            max_pow=int(math.log2(cfg.shortcut_max_steps)),
        )
        noisy_sc, _ = prepare_noised_latents(
            k_sc_noise, latents, durations.departure_timesteps
        )

        def denoise(lat, t, dur):
            return model.denoiser(
                params["denoiser"], lat.astype(dtype), hidden,
                t.astype(dtype), shortcut_duration=dur.astype(dtype),
            )

        first, second = prepare_self_consistency_targets(
            denoise, noisy_sc, durations.departure_timesteps,
            durations.shortcut_duration, cfg_scale=cfg.shortcut_cfg_scale,
        )
        target_sc = get_shortcut_target_velocity(first, second)

        # blend the two groups per-sample (static shapes)
        m1 = flow_mask[:, None, None, None]
        noisy = jnp.where(m1, noisy_fm, noisy_sc)
        t = jnp.where(flow_mask, t_fm, durations.departure_timesteps)
        dur = jnp.where(flow_mask, d_fm, durations.shortcut_duration)
        target = jax.lax.stop_gradient(jnp.where(m1, target_fm, target_sc))

        prediction = denoise(noisy, t, dur)
        per_sample = jnp.mean(
            jnp.square(prediction.astype(jnp.float32) - target.astype(jnp.float32)),
            axis=(1, 2, 3),
        )
        loss = jnp.mean(per_sample)
        fm_frac = jnp.mean(flow_mask.astype(jnp.float32))
        logs = {
            "flow_match": jnp.sum(per_sample * flow_mask) / jnp.maximum(
                jnp.sum(flow_mask), 1
            ),
            "shortcut": jnp.sum(per_sample * ~flow_mask) / jnp.maximum(
                jnp.sum(~flow_mask), 1
            ),
            "flow_match_fraction": fm_frac,
        }
        return loss, logs

    def get_state_dict_to_save(self):
        if not self._is_peft:
            return self.model.state_dict()
        state_dict = get_adapter_parameters(self.model.params)
        from ...nn import flatten_params

        for k, v in flatten_params(
            self.model.params["denoiser"]["shortcut_embedder"]
        ).items():
            state_dict[f"denoiser.shortcut_embedder.{k}"] = v
        return {convert_to_comfy_key(k): v for k, v in state_dict.items()}
