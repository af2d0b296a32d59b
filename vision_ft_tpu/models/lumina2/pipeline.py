"""Lumina2 pipeline: checkpoint I/O + generate() with renorm CFG,
CFG-truncation, refined-caption-feature caching and optional DeepCache
delta caching (``deep_cache_interval``; see NextDiT.deepcache_forward).

Behavioral spec: /root/reference/src/models/lumina2/pipeline.py. TPU
deltas: one latent resolution per generate() call (the reference's
nested-tensor multi-resolution batches become per-resolution calls —
aspect-ratio buckets give one resolution per batch anyway); jitted CFG
step per shape; NHWC latents; refined caption features cached across the
loop exactly like the reference (:379-415).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ...utils.dtype import str_to_dtype as _str_to_dtype
import numpy as np
from PIL import Image

from ...nn import flatten_params, unflatten_params
from ...utils import safetensors as st
from ...utils import tensor as tensor_utils
from ..autoencoder import AutoencoderKL
from .config import Lumina2Config
from .denoiser import Denoiser
from .scheduler import Scheduler
from .text_encoder import DEFAULT_MAX_TOKEN_LENGTH, TextEncoder
from .util import convert_from_original_key, convert_to_original_key
from .vae import DEFAULT_VAE_CONFIG


class Lumina2:
    denoiser_class: type[Denoiser] = Denoiser

    def __init__(
        self,
        config: Lumina2Config,
        tokenizer=None,
        vae_config=None,
        text_encoder_config=None,
    ):
        self.config = config
        self.dtype = _str_to_dtype(config.dtype)
        self.denoiser = self.denoiser_class(config.denoiser)
        self.vae = AutoencoderKL(vae_config or DEFAULT_VAE_CONFIG)
        if tokenizer is None:
            from ..text_encoders.auto_tokenizer import maybe_auto_tokenizer

            tokenizer = maybe_auto_tokenizer(config, family="gemma")
        self.text_encoder = TextEncoder(config=text_encoder_config, tokenizer=tokenizer)
        self.scheduler = Scheduler()
        self.params: dict = {}

    @classmethod
    def from_config(cls, config: Lumina2Config, **kwargs) -> "Lumina2":
        return cls(config, **kwargs)

    # -- checkpoint I/O ------------------------------------------------------------

    def load_state_dict(self, flat: dict[str, jax.Array]) -> None:
        self.params = {
            root: unflatten_params(
                {k[len(root) + 1 :]: v for k, v in flat.items() if k.startswith(f"{root}.")}
            )
            for root in ("denoiser", "vae", "text_encoder")
        }

    def _from_checkpoint(self) -> None:
        state_dict = st.load_file(self.config.checkpoint_path, dtype=self.dtype)
        state_dict = {convert_from_original_key(k): v for k, v in state_dict.items()}
        from ...modules.quant import convert_prequantized_state_dict

        state_dict = convert_prequantized_state_dict(state_dict)
        self.load_state_dict(state_dict)

    @classmethod
    def from_checkpoint(cls, config: Lumina2Config, tokenizer=None) -> "Lumina2":
        model = cls(config, tokenizer=tokenizer)
        model._from_checkpoint()
        return model

    def init_params(self, key: jax.Array, dtype=None) -> None:
        dtype = dtype or self.dtype
        k1, k2, k3 = jax.random.split(key, 3)
        self.params = {
            "denoiser": self.denoiser.init(k1, dtype),
            "vae": self.vae.init(k2, dtype),
            "text_encoder": self.text_encoder.init(k3, dtype),
        }

    def state_dict(self) -> dict[str, jax.Array]:
        flat = {}
        for root in ("denoiser", "vae", "text_encoder"):
            flat.update(
                {f"{root}.{k}": v for k, v in flatten_params(self.params[root]).items()}
            )
        return {convert_to_original_key(k): v for k, v in flat.items()}

    # -- latents / images --------------------------------------------------------------

    def prepare_latents(
        self, batch_size: int, height: int, width: int, seed: Optional[int] = None
    ) -> jax.Array:
        ratio = int(self.vae.compression_ratio)
        shape = (
            batch_size,
            height // ratio,
            width // ratio,
            self.denoiser.config.in_channels,
        )
        return tensor_utils.incremental_seed_randn(shape, seed, dtype=self.dtype)

    def encode_image(self, image, key: Optional[jax.Array] = None) -> jax.Array:
        if isinstance(image, Image.Image):
            image = tensor_utils.images_to_tensor([image], self.dtype)
        elif isinstance(image, (list, tuple)):
            image = tensor_utils.images_to_tensor(list(image), self.dtype)
        dist = self.vae.encode(self.params["vae"], image.astype(self.dtype))
        z = dist.sample(key) if key is not None else dist.mode()
        return (z - self.vae.shift_factor) * self.vae.scaling_factor

    def decode_image(self, latents: jax.Array) -> list[Image.Image]:
        z = latents / self.vae.scaling_factor + self.vae.shift_factor
        return tensor_utils.tensor_to_images(self.vae.decode(self.params["vae"], z))

    # -- compiled CFG step ------------------------------------------------------------

    def _denoise_step(
        self,
        params,
        latents,
        timestep,
        sigma,
        next_sigma,
        caption_features,
        caption_mask,
        cached_features,
        cfg_scale,
        renorm_cfg_scale,
        cached_delta=None,
        do_cfg: bool = False,
        use_cache: bool = False,
        deep_cache: bool = False,
        refresh: bool = True,
        cache_depth: Optional[int] = None,
    ):
        batch = latents.shape[0]
        latents_input = jnp.concatenate([latents, latents]) if do_cfg else latents
        t = jnp.broadcast_to(timestep, (latents_input.shape[0],))
        if deep_cache:
            velocity, _mask, refined, delta = self.denoiser.deepcache_forward(
                params,
                latents_input,
                caption_features,
                t,
                caption_mask,
                cached_caption_features=cached_features if use_cache else None,
                cached_delta=cached_delta,
                refresh=refresh,
                cache_depth=cache_depth,
            )
        else:
            velocity, _mask, refined = self.denoiser(
                params,
                latents_input,
                caption_features,
                t,
                caption_mask,
                cached_caption_features=cached_features if use_cache else None,
            )
            delta = None
        if do_cfg:
            positive, negative = velocity[:batch], velocity[batch:]
            new_velocity = negative + cfg_scale * (positive - negative)
            # renorm CFG (reference pipeline.py:287-307). The reference
            # norms over the torch tensor's last axis (W of CHW); in NHWC
            # that is axis 2.
            positive_norm = jnp.linalg.norm(
                positive.astype(jnp.float32), axis=2, keepdims=True
            )
            new_norm = jnp.linalg.norm(
                new_velocity.astype(jnp.float32), axis=2, keepdims=True
            )
            scale = jnp.where(
                renorm_cfg_scale > 0.0,
                positive_norm * renorm_cfg_scale / jnp.maximum(new_norm, 1e-12),
                1.0,
            ).astype(new_velocity.dtype)
            velocity = new_velocity * scale
        new_latents = latents.astype(jnp.float32) + velocity.astype(jnp.float32) * (
            sigma - next_sigma
        )
        if deep_cache:
            return new_latents.astype(latents.dtype), refined, delta
        return new_latents.astype(latents.dtype), refined

    # -- continuous-batching slot step -------------------------------------------------

    def _slot_step(
        self,
        params,
        latents,           # (S, h, w, c) — one row per serving slot
        timestep,          # (S,) f32 — per-slot denoise position
        sigma,             # (S,) f32
        next_sigma,        # (S,) f32
        caption_features,  # (2S, L, D) [positives; negatives]
        caption_mask,      # (2S, L)
        cfg_scale,         # (S,) f32
        renorm_cfg_scale,  # (S,) f32
        cfg_trunc_ratio,   # (S,) f32
        step_idx,          # (S,) i32
        total_steps,       # (S,) i32
        active,            # (S,) bool — inactive rows keep their latents
    ):
        """One flow-matching Euler step over a SLOT POOL — the Lumina2 jit
        unit of step-level continuous batching (vision_ft_tpu.serving).
        Every per-request scalar of :meth:`_denoise_step` is a per-slot
        vector, including Lumina2's CFG-truncation gate
        ((i+1)/n > trunc_ratio, reference pipeline.py:379-415): truncated
        slots take the bare positive velocity — the negative half still
        computes (constant shapes), its result is just unselected. Captions
        are re-refined every step instead of reusing generate()'s caption
        cache; the refinement is latent/time-independent so the math is
        identical."""
        s = latents.shape[0]
        expand = lambda v: v[:, None, None, None]
        latents_input = jnp.concatenate([latents, latents])
        t2 = jnp.concatenate([timestep, timestep])
        velocity, _mask, _refined = self.denoiser(
            params, latents_input,
            caption_features, t2, caption_mask,
            cached_caption_features=None,
        )
        positive, negative = velocity[:s], velocity[s:]
        new_velocity = negative + expand(cfg_scale) * (positive - negative)
        # renorm CFG (reference pipeline.py:287-307): norm over NHWC axis 2
        positive_norm = jnp.linalg.norm(
            positive.astype(jnp.float32), axis=2, keepdims=True
        )
        new_norm = jnp.linalg.norm(
            new_velocity.astype(jnp.float32), axis=2, keepdims=True
        )
        scale = jnp.where(
            expand(renorm_cfg_scale) > 0.0,
            positive_norm * expand(renorm_cfg_scale)
            / jnp.maximum(new_norm, 1e-12),
            1.0,
        ).astype(new_velocity.dtype)
        ratio = (step_idx.astype(jnp.float32) + 1.0) / total_steps.astype(
            jnp.float32
        )
        do_cfg_step = (cfg_scale > 1.0) & (ratio > cfg_trunc_ratio)
        velocity = jnp.where(expand(do_cfg_step), new_velocity * scale, positive)
        new_latents = latents.astype(jnp.float32) + velocity.astype(
            jnp.float32
        ) * expand(sigma - next_sigma)
        new_latents = new_latents.astype(latents.dtype)
        return jnp.where(expand(active), new_latents, latents)

    def _get_jit_slot_step(self):
        from ...nn.core import cached_jit

        return cached_jit(self, "slot_step", self._slot_step)

    def _get_jit_step(self, do_cfg: bool, use_cache: bool,
                      deep_cache: bool = False, refresh: bool = True,
                      cache_depth: Optional[int] = None):
        from ...nn.core import cached_jit

        return cached_jit(
            self, f"step_{do_cfg}_{use_cache}_{deep_cache}_{refresh}_{cache_depth}",
            partial(self._denoise_step, do_cfg=do_cfg, use_cache=use_cache,
                    deep_cache=deep_cache, refresh=refresh,
                    cache_depth=cache_depth),
        )

    # -- generate --------------------------------------------------------------------------

    def generate(
        self,
        prompt,
        negative_prompt=None,
        width: int = 768,
        height: int = 768,
        num_inference_steps: int = 25,
        cfg_scale: float = 5.0,
        renorm_cfg_scale: float = 1.0,
        cfg_truncation_ratio: float = 0.0,
        max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH,
        seed: Optional[int] = None,
        do_offloading: bool = False,
        deep_cache_interval: Optional[int] = None,
        deep_cache_depth: Optional[int] = None,
    ) -> list[Image.Image]:
        do_cfg = cfg_scale > 1.0
        timesteps = self.scheduler.get_timesteps(num_inference_steps)
        sigmas = self.scheduler.get_sigmas(num_inference_steps)
        prompts = list(prompt) if isinstance(prompt, (list, tuple)) else [prompt]
        batch_size = len(prompts)

        from ...modules.offload import move_params, stage_on_device

        with stage_on_device(self.params, "text_encoder", do_offloading):
            encoder_output = self.text_encoder.encode_prompts(
                self.params["text_encoder"],
                prompts,
                negative_prompt,
                use_negative_prompts=do_cfg,
                max_token_length=max_token_length,
            )

        latents = self.prepare_latents(batch_size, height, width, seed=seed)

        if do_offloading:
            self.params["denoiser"] = move_params(self.params["denoiser"], "tpu")
        cached_features = None
        cached_was_cfg = None
        cached_delta = None
        for i, t in enumerate(timesteps):
            current_step_ratio = (i + 1) / num_inference_steps
            do_cfg_step = do_cfg and current_step_ratio > cfg_truncation_ratio

            if do_cfg_step:
                caption_features = jnp.concatenate(
                    [encoder_output.positive_embeddings, encoder_output.negative_embeddings]
                ).astype(self.dtype)
                caption_mask = jnp.concatenate(
                    [
                        encoder_output.positive_attention_mask,
                        encoder_output.negative_attention_mask,
                    ]
                )
            else:
                caption_features = encoder_output.positive_embeddings.astype(self.dtype)
                caption_mask = encoder_output.positive_attention_mask

            # drop the caches when the CFG batch size changes (reference :379-415)
            if cached_was_cfg is not None and cached_was_cfg != do_cfg_step:
                cached_features = None
                cached_delta = None
            use_cache = cached_features is not None

            step_args = (
                self.params["denoiser"],
                latents,
                jnp.float32(t),
                jnp.float32(sigmas[i]),
                jnp.float32(sigmas[i + 1]),
                caption_features,
                caption_mask,
                cached_features if use_cache else caption_features,  # placeholder arg
                jnp.float32(cfg_scale),
                jnp.float32(renorm_cfg_scale),
            )
            if deep_cache_interval:
                refresh = (i % deep_cache_interval == 0) or cached_delta is None
                step = self._get_jit_step(
                    do_cfg_step, use_cache, deep_cache=True, refresh=refresh,
                    cache_depth=deep_cache_depth,
                )
                latents, refined, cached_delta = step(
                    *step_args, None if refresh else cached_delta
                )
            else:
                step = self._get_jit_step(do_cfg_step, use_cache)
                latents, refined = step(*step_args)
            cached_features = refined
            cached_was_cfg = do_cfg_step

        if do_offloading:
            self.params["denoiser"] = move_params(self.params["denoiser"], "cpu")
        with stage_on_device(self.params, "vae", do_offloading):
            return self.decode_image(latents)
