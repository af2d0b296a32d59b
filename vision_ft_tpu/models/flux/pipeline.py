"""Flux pipeline (reference src/models/flux/pipeline.py): single-file
checkpoint I/O + linear-schedule Euler generate with distilled guidance."""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ...utils.dtype import str_to_dtype as _str_to_dtype
import numpy as np
from PIL import Image

from ...modules.timestep.scheduler import get_linear_schedule
from ...nn import flatten_params, unflatten_params
from ...utils import safetensors as st
from ...utils import tensor as tensor_utils
from ..autoencoder import AutoencoderKL
from .config import FluxConfig
from .denoiser import Denoiser
from .text_encoder import DEFAULT_T5_MAX_TOKEN_LENGTH, TextEncoder
from .util import convert_from_original_key, convert_to_original_key
from .vae import DEFAULT_VAE_CONFIG


class FluxModel:
    denoiser_class: type[Denoiser] = Denoiser

    def __init__(self, config: FluxConfig, clip_tokenizer=None, t5_tokenizer=None,
                 vae_config=None, clip_config=None, t5_config=None):
        self.config = config
        self.dtype = _str_to_dtype(config.dtype)
        self.denoiser = self.denoiser_class.from_config(config.denoiser)
        self.vae = AutoencoderKL(vae_config or DEFAULT_VAE_CONFIG)
        self.text_encoder = TextEncoder(
            clip_config=clip_config, t5_config=t5_config,
            clip_tokenizer=clip_tokenizer, t5_tokenizer=t5_tokenizer,
        )
        self.params: dict = {}

    @classmethod
    def from_config(cls, config: FluxConfig, **kwargs) -> "FluxModel":
        return cls(config, **kwargs)

    # -- checkpoint I/O ---------------------------------------------------------

    def load_state_dict(self, flat: dict[str, jax.Array]) -> None:
        self.params = {
            root: unflatten_params(
                {k[len(root) + 1 :]: v for k, v in flat.items() if k.startswith(f"{root}.")}
            )
            for root in ("denoiser", "vae", "text_encoder")
        }

    def load_checkpoint_weights(self) -> None:
        state_dict = st.load_file(self.config.checkpoint_path, dtype=self.dtype)
        state_dict = {convert_from_original_key(k): v for k, v in state_dict.items()}
        # T5 ties shared <-> embed_tokens (reference text_encoder.py:146-176)
        shared = "text_encoder.t5.shared.weight"
        embed = "text_encoder.t5.encoder.embed_tokens.weight"
        if shared not in state_dict and embed in state_dict:
            state_dict[shared] = state_dict[embed]
        elif embed not in state_dict and shared in state_dict:
            state_dict[embed] = state_dict[shared]
        # drop CLIP text_projection if present
        state_dict.pop("text_encoder.clip.text_projection.weight", None)
        from ...modules.quant import convert_prequantized_state_dict

        state_dict = convert_prequantized_state_dict(state_dict)
        self.load_state_dict(state_dict)

    @classmethod
    def from_checkpoint(cls, config: FluxConfig, **kwargs) -> "FluxModel":
        model = cls(config, **kwargs)
        model.load_checkpoint_weights()
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

    # -- latents / images -----------------------------------------------------------

    def prepare_latents(self, batch_size: int, height: int, width: int,
                        seed: Optional[int] = None) -> jax.Array:
        ratio = int(self.vae.compression_ratio)
        shape = (
            batch_size, height // ratio, width // ratio, self.vae.config.latent_channels
        )
        return tensor_utils.incremental_seed_randn(shape, seed, dtype=self.dtype)

    def encode_image(self, image, key: Optional[jax.Array] = None) -> jax.Array:
        if isinstance(image, Image.Image):
            image = tensor_utils.images_to_tensor([image], self.dtype)
        elif isinstance(image, (list, tuple)):
            image = tensor_utils.images_to_tensor(list(image), self.dtype)
        dist = self.vae.encode(self.params["vae"], image.astype(self.dtype))
        z = dist.sample(key) if key is not None else dist.mode()
        # reference quirk: Flux's encode/decode skip the shift_factor
        return z * self.vae.scaling_factor

    def decode_image(self, latents: jax.Array) -> list[Image.Image]:
        return tensor_utils.tensor_to_images(
            self.vae.decode(self.params["vae"], latents / self.vae.scaling_factor)
        )

    # -- compiled step ------------------------------------------------------------------

    def _denoise_step(self, params, latents, timestep, delta, t5_emb, clip_emb,
                      guidance, cfg_scale, cached_delta=None,
                      do_cfg: bool = False, deep_cache: bool = False,
                      refresh: bool = True, cache_depth=None):
        model_input = jnp.concatenate([latents, latents]) if do_cfg else latents
        batch = model_input.shape[0]
        t = jnp.broadcast_to(timestep.astype(latents.dtype), (batch,))
        g = jnp.broadcast_to(guidance.astype(latents.dtype), (batch,))
        if deep_cache:
            velocity, dc_delta = self.denoiser.deepcache_forward(
                params, model_input, t5_emb, t, clip_emb, guidance=g,
                cached_delta=cached_delta, refresh=refresh,
                cache_depth=cache_depth,
            )
        else:
            velocity = self.denoiser(params, model_input, t5_emb, t, clip_emb, guidance=g)
            dc_delta = None
        if do_cfg:
            positive, negative = jnp.split(velocity, 2)
            velocity = negative + cfg_scale * (positive - negative)
        new_latents = (
            latents.astype(jnp.float32) - velocity.astype(jnp.float32) * delta
        ).astype(latents.dtype)
        if deep_cache:
            return new_latents, dc_delta
        return new_latents

    def _get_jit_step(self, do_cfg: bool, deep_cache: bool = False,
                      refresh: bool = True, cache_depth=None):
        from ...nn.core import cached_jit

        return cached_jit(
            self, f"step_{do_cfg}_{deep_cache}_{refresh}_{cache_depth}",
            partial(self._denoise_step, do_cfg=do_cfg, deep_cache=deep_cache,
                    refresh=refresh, cache_depth=cache_depth),
        )

    # -- continuous-batching slot step -------------------------------------------------

    def _slot_step(
        self,
        params,
        latents,      # (S, h, w, c) — one row per serving slot
        timestep,     # (S,) f32 — per-slot denoise position
        total_steps,  # (S,) i32 — per-slot step count (delta = 1/total)
        t5_emb,       # (2S, L, D) [positives; negatives]
        clip_emb,     # (2S, P)
        guidance,     # (S,) f32 — per-slot distilled guidance
        cfg_scale,    # (S,) f32
        active,       # (S,) bool — inactive rows keep their latents
    ):
        """One flow-matching Euler step over a SLOT POOL — the Flux jit
        unit of step-level continuous batching (vision_ft_tpu.serving).
        Flux's Euler delta is the CONSTANT 1/num_steps of
        :meth:`generate` (not a sigma difference), so it derives from the
        per-slot ``total_steps`` vector; the distilled guidance scalar
        becomes a per-slot vector fed to the denoiser's guidance
        embedding. Update sign matches :meth:`_denoise_step`:
        latents - v * delta."""
        s = latents.shape[0]
        expand = lambda v: v[:, None, None, None]
        model_input = jnp.concatenate([latents, latents])
        t2 = jnp.concatenate([timestep, timestep]).astype(latents.dtype)
        g2 = jnp.concatenate([guidance, guidance]).astype(latents.dtype)
        velocity = self.denoiser(
            params, model_input, t5_emb, t2, clip_emb, guidance=g2
        )
        positive, negative = velocity[:s], velocity[s:]
        do_cfg = cfg_scale > 1.0
        velocity = jnp.where(
            expand(do_cfg),
            negative + expand(cfg_scale) * (positive - negative),
            positive,
        )
        delta = 1.0 / jnp.maximum(total_steps.astype(jnp.float32), 1.0)
        new_latents = (
            latents.astype(jnp.float32)
            - velocity.astype(jnp.float32) * expand(delta)
        ).astype(latents.dtype)
        return jnp.where(expand(active), new_latents, latents)

    def _get_jit_slot_step(self):
        from ...nn.core import cached_jit

        return cached_jit(self, "slot_step", self._slot_step)

    # -- generate ----------------------------------------------------------------------------

    def generate(
        self,
        prompt,
        negative_prompt=None,
        width: int = 768,
        height: int = 768,
        num_inference_steps: int = 20,
        cfg_scale: float = 1.0,
        distilled_guidance_scale: float = 1.0,
        seed: Optional[int] = None,
        max_token_length: int = DEFAULT_T5_MAX_TOKEN_LENGTH,
        do_offloading: bool = False,
        deep_cache_interval: Optional[int] = None,
        deep_cache_depth: Optional[int] = None,
    ) -> list[Image.Image]:
        from ...modules.offload import move_params, stage_on_device

        do_cfg = cfg_scale > 1.0
        batch_size = len(prompt) if isinstance(prompt, (list, tuple)) else 1
        with stage_on_device(self.params, "text_encoder", do_offloading):
            encoder_output = self.text_encoder.encode_prompts(
                self.params["text_encoder"], prompt, negative_prompt,
                use_negative_prompts=do_cfg, t5_max_token_length=max_token_length,
            )
        t5_emb = jnp.concatenate(
            [encoder_output.t5.positive_embeddings, encoder_output.t5.negative_embeddings]
        ).astype(self.dtype)
        clip_emb = jnp.concatenate(
            [encoder_output.clip.positive_embeddings, encoder_output.clip.negative_embeddings]
        ).astype(self.dtype)

        latents = self.prepare_latents(batch_size, height, width, seed=seed)
        timesteps = get_linear_schedule(num_inference_steps)
        delta = 1.0 / num_inference_steps

        if do_offloading:
            self.params["denoiser"] = move_params(self.params["denoiser"], "tpu")
        cached_delta = None
        for i, t in enumerate(timesteps):
            step_args = (
                self.params["denoiser"], latents, jnp.float32(t), jnp.float32(delta),
                t5_emb, clip_emb, jnp.float32(distilled_guidance_scale),
                jnp.float32(cfg_scale),
            )
            if deep_cache_interval:
                refresh = (i % deep_cache_interval == 0) or cached_delta is None
                step = self._get_jit_step(
                    do_cfg, deep_cache=True, refresh=refresh,
                    cache_depth=deep_cache_depth,
                )
                latents, cached_delta = step(
                    *step_args, None if refresh else cached_delta
                )
            else:
                step = self._get_jit_step(do_cfg)
                latents = step(*step_args)
        if do_offloading:
            self.params["denoiser"] = move_params(self.params["denoiser"], "cpu")
        with stage_on_device(self.params, "vae", do_offloading):
            return self.decode_image(latents)
