"""CogView4 pipeline (reference src/models/cogview4/pipeline.py):
single-file checkpoint I/O + linear-time-shift Euler generate with
Lumina-style inverted timesteps (t=1 noise at schedule start 1000 -> 1)."""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ...utils.dtype import str_to_dtype as _str_to_dtype
import numpy as np
from PIL import Image

from ...modules.timestep.sampling import time_shift_linear
from ...nn import flatten_params, unflatten_params
from ...utils import safetensors as st
from ...utils import tensor as tensor_utils
from ..autoencoder import AutoencoderKL
from .config import CogView4Config
from .denoiser import Denoiser
from .scheduler import calculate_time_shift
from .text_encoder import DEFAULT_MAX_TOKEN_LENGTH, TextEncoder
from .vae import DEFAULT_VAE_CONFIG


def convert_from_original_key(key: str) -> str:
    key = key.replace("diffusion_model.", "denoiser.", 1)
    key = key.replace("text_encoder.", "text_encoder.model.", 1)
    return key


def convert_to_original_key(key: str) -> str:
    key = key.replace("denoiser.", "diffusion_model.", 1)
    key = key.replace("text_encoder.model.", "text_encoder.", 1)
    return key


convert_to_comfy_key = convert_to_original_key


class CogView4Model:
    denoiser_class: type[Denoiser] = Denoiser

    def __init__(self, config: CogView4Config, tokenizer=None,
                 vae_config=None, text_encoder_config=None):
        self.config = config
        self.dtype = _str_to_dtype(config.dtype)
        self.denoiser = self.denoiser_class(config.denoiser)
        self.vae = AutoencoderKL(vae_config or DEFAULT_VAE_CONFIG)
        if tokenizer is None:
            from ..text_encoders.auto_tokenizer import maybe_auto_tokenizer

            tokenizer = maybe_auto_tokenizer(config, family="glm")
        self.text_encoder = TextEncoder(config=text_encoder_config, tokenizer=tokenizer)
        self.params: dict = {}

    @classmethod
    def from_config(cls, config: CogView4Config, **kwargs) -> "CogView4Model":
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
    def from_checkpoint(cls, config: CogView4Config, tokenizer=None) -> "CogView4Model":
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

    # -- latents / images ------------------------------------------------------------

    def prepare_latents(self, batch_size: int, height: int, width: int,
                        seed: Optional[int] = None) -> jax.Array:
        ratio = int(self.vae.compression_ratio)
        shape = (batch_size, height // ratio, width // ratio,
                 self.denoiser.config.in_channels)
        return tensor_utils.incremental_seed_randn(shape, seed, dtype=self.dtype)

    def encode_image(self, image, key: Optional[jax.Array] = None) -> jax.Array:
        if isinstance(image, Image.Image):
            image = tensor_utils.images_to_tensor([image], self.dtype)
        elif isinstance(image, (list, tuple)):
            image = tensor_utils.images_to_tensor(list(image), self.dtype)
        dist = self.vae.encode(self.params["vae"], image.astype(self.dtype))
        z = dist.sample(key) if key is not None else dist.mode()
        return z * self.vae.scaling_factor

    def decode_image(self, latents: jax.Array) -> list[Image.Image]:
        return tensor_utils.tensor_to_images(
            self.vae.decode(self.params["vae"], latents / self.vae.scaling_factor)
        )

    # -- schedule ----------------------------------------------------------------------

    def prepare_timesteps(self, num_inference_steps: int, height: int, width: int):
        image_seq_len = (
            (height // int(self.vae.compression_ratio))
            * (width // int(self.vae.compression_ratio))
            // (self.denoiser.patch_size**2)
        )
        timesteps = np.linspace(1000.0, 1.0, num_inference_steps).astype(np.int64).astype(
            np.float32
        )
        sigmas = timesteps / 1000.0
        mu = calculate_time_shift(image_seq_len)
        sigmas = time_shift_linear(mu, sigmas)
        sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float32)
        return timesteps, sigmas

    # -- compiled step ------------------------------------------------------------------

    def _denoise_step(self, params, latents, timestep, sigma, next_sigma, embeddings,
                      original_size, target_size, crop_coords, cfg_scale,
                      cached_delta=None, do_cfg: bool = False,
                      deep_cache: bool = False, refresh: bool = True,
                      cache_depth=None):
        model_input = jnp.concatenate([latents, latents]) if do_cfg else latents
        batch = model_input.shape[0]
        t = jnp.broadcast_to(timestep.astype(latents.dtype), (batch,))
        if deep_cache:
            velocity, delta = self.denoiser.deepcache_forward(
                params, model_input, embeddings, t, original_size, target_size,
                crop_coords, cached_delta=cached_delta, refresh=refresh,
                cache_depth=cache_depth,
            )
        else:
            velocity = self.denoiser(
                params, model_input, embeddings, t, original_size, target_size, crop_coords
            )
            delta = None
        if do_cfg:
            positive, negative = jnp.split(velocity, 2)
            velocity = negative + cfg_scale * (positive - negative)
        new_latents = latents.astype(jnp.float32) + velocity.astype(jnp.float32) * (
            next_sigma - sigma
        )
        if deep_cache:
            return new_latents.astype(latents.dtype), delta
        return new_latents.astype(latents.dtype)

    def _get_jit_step(self, do_cfg: bool, deep_cache: bool = False,
                      refresh: bool = True, cache_depth=None):
        from ...nn.core import cached_jit

        return cached_jit(
            self, f"step_{do_cfg}_{deep_cache}_{refresh}_{cache_depth}",
            partial(self._denoise_step, do_cfg=do_cfg, deep_cache=deep_cache,
                    refresh=refresh, cache_depth=cache_depth),
        )

    # -- continuous-batching slot step ---------------------------------------------

    def _slot_step(
        self,
        params,
        latents,        # (S, h, w, c) — one row per serving slot
        timestep,       # (S,) f32 — per-slot denoise position
        sigma,          # (S,) f32
        next_sigma,     # (S,) f32
        embeddings,     # (2S, L, D) [positives; negatives]
        original_size,  # (2S, 2)
        target_size,    # (2S, 2)
        crop_coords,    # (2S, 2)
        cfg_scale,      # (S,) f32
        active,         # (S,) bool — inactive rows keep their latents
    ):
        """One flow-matching Euler step over a SLOT POOL — the CogView4
        jit unit of step-level continuous batching (vision_ft_tpu.serving).
        Plain CFG like AuraFlow's (reference cogview4 pipeline has neither
        renorm nor truncation); per-request scalars of
        :meth:`_denoise_step` become per-slot vectors, and the per-slot
        timestep vector feeds the denoiser directly (it already accepts a
        per-sample time embedding). Latent update sign matches
        :meth:`_denoise_step`: latents + v * (next_sigma - sigma)."""
        s = latents.shape[0]
        expand = lambda v: v[:, None, None, None]
        model_input = jnp.concatenate([latents, latents])
        t2 = jnp.concatenate([timestep, timestep]).astype(latents.dtype)
        velocity = self.denoiser(
            params, model_input, embeddings, t2, original_size, target_size,
            crop_coords,
        )
        positive, negative = velocity[:s], velocity[s:]
        do_cfg = cfg_scale > 1.0
        velocity = jnp.where(
            expand(do_cfg),
            negative + expand(cfg_scale) * (positive - negative),
            positive,
        )
        new_latents = latents.astype(jnp.float32) + velocity.astype(
            jnp.float32
        ) * expand(next_sigma - sigma)
        new_latents = new_latents.astype(latents.dtype)
        return jnp.where(expand(active), new_latents, latents)

    def _get_jit_slot_step(self):
        from ...nn.core import cached_jit

        return cached_jit(self, "slot_step", self._slot_step)

    # -- generate ------------------------------------------------------------------------------

    def generate(
        self,
        prompt,
        negative_prompt=None,
        width: int = 768,
        height: int = 768,
        original_size=None,
        target_size=None,
        crop_coords_top_left=(0, 0),
        num_inference_steps: int = 20,
        cfg_scale: float = 3.5,
        seed: Optional[int] = None,
        max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH,
        do_offloading: bool = False,
        deep_cache_interval: Optional[int] = None,
        deep_cache_depth: Optional[int] = None,
    ) -> list[Image.Image]:
        do_cfg = cfg_scale > 1.0
        timesteps, sigmas = self.prepare_timesteps(num_inference_steps, height, width)
        batch_size = len(prompt) if isinstance(prompt, (list, tuple)) else 1
        original_size = original_size or (height, width)
        target_size = target_size or (height, width)

        from ...modules.offload import move_params, stage_on_device

        with stage_on_device(self.params, "text_encoder", do_offloading):
            encoder_output = self.text_encoder.encode_prompts(
                self.params["text_encoder"], prompt, negative_prompt,
                use_negative_prompts=do_cfg, max_token_length=max_token_length,
            )
        embeddings = jnp.concatenate(
            [encoder_output.positive_embeddings, encoder_output.negative_embeddings]
        ).astype(self.dtype)

        latents = self.prepare_latents(batch_size, height, width, seed=seed)

        cond_batch = embeddings.shape[0]
        sizes = lambda t: jnp.broadcast_to(jnp.asarray(t, jnp.float32), (cond_batch, 2))
        if do_offloading:
            self.params["denoiser"] = move_params(self.params["denoiser"], "tpu")
        cached_delta = None
        for i, t in enumerate(timesteps):
            step_args = (
                self.params["denoiser"], latents, jnp.float32(t),
                jnp.float32(sigmas[i]), jnp.float32(sigmas[i + 1]),
                embeddings, sizes(original_size), sizes(target_size),
                sizes(crop_coords_top_left), jnp.float32(cfg_scale),
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
