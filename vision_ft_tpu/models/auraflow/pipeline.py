"""AuraFlow pipeline: single-file checkpoint I/O + generate().

Behavioral spec: /root/reference/src/models/auraflow/pipeline.py. TPU
deltas mirror the SDXL pipeline: explicit param pytree loaded straight
from safetensors, one jitted CFG-Euler step per (batch, H, W) shape,
NHWC latents. The flow-match loop feeds timestep = sigma (t/1000 of the
scheduler's timesteps) like the reference (:302-341).
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
from ..sdxl.util import vae_convert_from_original_key
from .config import AuraFlowConig
from .denoiser import Denoiser
from .scheduler import Scheduler
from .text_encoder import DEFAULT_MAX_TOKEN_LENGTH, TextEncoder
from .util import convert_from_original_key, convert_to_original_key
from .vae import DEFAULT_VAE_CONFIG, VAE, detect_vae_type


class AuraFlowModel:
    denoiser_class: type[Denoiser] = Denoiser

    def __init__(
        self,
        config: AuraFlowConig,
        tokenizer=None,
        vae_config=None,
        text_encoder_config=None,
    ):
        self.config = config
        self.dtype = _str_to_dtype(config.dtype)
        self.denoiser = self.denoiser_class.from_config(config.denoiser)
        self.vae = AutoencoderKL(vae_config or DEFAULT_VAE_CONFIG)
        if tokenizer is None:
            from ..text_encoders.auto_tokenizer import maybe_auto_tokenizer

            tokenizer = maybe_auto_tokenizer(config, family="t5")
        self.text_encoder = TextEncoder(config=text_encoder_config, tokenizer=tokenizer)
        self.scheduler = Scheduler()
        self.params: dict = {}

    @classmethod
    def from_config(cls, config: AuraFlowConig, **kwargs) -> "AuraFlowModel":
        return cls(config, **kwargs)

    # -- checkpoint I/O ---------------------------------------------------------

    def load_state_dict(self, flat: dict[str, jax.Array]) -> None:
        self.params = {
            root: unflatten_params(
                {k[len(root) + 1 :]: v for k, v in flat.items() if k.startswith(f"{root}.")}
            )
            for root in ("denoiser", "vae", "text_encoder")
        }

    def _load_original_weights(self) -> None:
        state_dict = st.load_file(self.config.checkpoint_path, dtype=self.dtype)
        state_dict = {convert_from_original_key(k): v for k, v in state_dict.items()}
        # UMT5 ties shared <-> encoder.embed_tokens; fill whichever is missing
        shared = "text_encoder.model.shared.weight"
        embed = "text_encoder.model.encoder.embed_tokens.weight"
        if shared not in state_dict and embed in state_dict:
            state_dict[shared] = state_dict[embed]
        elif embed not in state_dict and shared in state_dict:
            state_dict[embed] = state_dict[shared]
        # VAE: accept both diffusers ("autoencoder_kl") and sgm ("original")
        # namings — the reference warns and re-downloads for "original"
        # (pipeline.py:109-117); zero-egress here, so we key-convert instead.
        if any(k.startswith("vae.") for k in state_dict):
            if detect_vae_type(state_dict) == "original":
                state_dict = {
                    (vae_convert_from_original_key(k) if k.startswith("vae.") else k): v
                    for k, v in state_dict.items()
                }
        from ...modules.quant import convert_prequantized_state_dict

        state_dict = convert_prequantized_state_dict(state_dict)
        self.load_state_dict(state_dict)

    @classmethod
    def from_original_checkpoint(cls, config: AuraFlowConig, tokenizer=None) -> "AuraFlowModel":
        model = cls(config, tokenizer=tokenizer)
        model._load_original_weights()
        return model

    # alias for API parity with SDXLModel
    from_checkpoint = from_original_checkpoint

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

    # -- latents / images ----------------------------------------------------------

    def prepare_latents(
        self,
        batch_size: int,
        height: int,
        width: int,
        seed: Optional[int] = None,
        latents: Optional[jax.Array] = None,
    ) -> jax.Array:
        if latents is not None:
            return latents.astype(self.dtype)
        shape = (
            batch_size,
            height // int(self.vae.compression_ratio),
            width // int(self.vae.compression_ratio),
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
        return z * self.vae.scaling_factor

    def decode_image(self, latents: jax.Array) -> list[Image.Image]:
        image = self.vae.decode(self.params["vae"], latents / self.vae.scaling_factor)
        return tensor_utils.tensor_to_images(image)

    # -- compiled denoise step --------------------------------------------------------

    def _denoise_step(
        self, params, latents, sigma, sigma_next, embeddings, cfg_scale,
        cached_delta=None, do_cfg: bool = False, deep_cache: bool = False,
        refresh: bool = True, cache_depth=None,
    ):
        model_input = jnp.concatenate([latents, latents]) if do_cfg else latents
        batch = model_input.shape[0]
        timestep = jnp.broadcast_to(sigma.astype(latents.dtype), (batch,))
        if deep_cache:
            velocity, delta = self.denoiser.deepcache_forward(
                params, model_input, embeddings, timestep,
                cached_delta=cached_delta, refresh=refresh,
                cache_depth=cache_depth,
            )
        else:
            velocity = self.denoiser(params, model_input, embeddings, timestep)
            delta = None
        if do_cfg:
            positive, negative = jnp.split(velocity, 2)
            velocity = negative + cfg_scale * (positive - negative)
        new_latents = latents.astype(jnp.float32) + (
            sigma_next - sigma
        ) * velocity.astype(jnp.float32)
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

    # -- continuous-batching slot step ----------------------------------------------

    def _slot_step(
        self,
        params,
        latents,      # (S, h, w, c) — one row per serving slot
        timestep,     # (S,) f32 — unused (flow match: the model time IS sigma)
        sigma,        # (S,) f32
        next_sigma,   # (S,) f32
        embeddings,   # (2S, L, D) [positives; negatives]
        cfg_scale,    # (S,) f32
        active,       # (S,) bool — inactive rows keep their latents
    ):
        """One flow-matching Euler step over a SLOT POOL — the AuraFlow jit
        unit of step-level continuous batching (vision_ft_tpu.serving).
        Plain CFG (no renorm/truncation — reference auraflow pipeline has
        neither, /root/reference/src/models/auraflow/pipeline.py:242-341);
        per-request scalars of :meth:`_denoise_step` become per-slot
        vectors. The negative half always computes (constant shapes);
        cfg_scale<=1 slots simply resolve to the positive velocity."""
        s = latents.shape[0]
        expand = lambda v: v[:, None, None, None]
        model_input = jnp.concatenate([latents, latents])
        t2 = jnp.concatenate([sigma, sigma]).astype(latents.dtype)
        velocity = self.denoiser(params, model_input, embeddings, t2)
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

    # -- generate ---------------------------------------------------------------------

    def generate(
        self,
        prompt,
        negative_prompt=None,
        width: int = 768,
        height: int = 768,
        num_inference_steps: int = 20,
        cfg_scale: float = 1.0,
        seed: Optional[int] = None,
        max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH,
        do_offloading: bool = False,
        deep_cache_interval: Optional[int] = None,
        deep_cache_depth: Optional[int] = None,
    ) -> list[Image.Image]:
        do_cfg = cfg_scale > 1.0
        timesteps, num_inference_steps = self.scheduler.retrieve_timesteps(
            num_inference_steps
        )
        sigmas = self.scheduler.sigmas
        batch_size = len(prompt) if isinstance(prompt, (list, tuple)) else 1

        from ...modules.offload import move_params, stage_on_device

        with stage_on_device(self.params, "text_encoder", do_offloading):
            encoder_output = self.text_encoder.encode_prompts(
                self.params["text_encoder"],
                prompt,
                negative_prompt,
                use_negative_prompts=do_cfg,
                max_token_length=max_token_length,
            )
        embeddings = jnp.concatenate(
            [encoder_output.positive_embeddings, encoder_output.negative_embeddings]
        ).astype(self.dtype)

        latents = self.prepare_latents(batch_size, height, width, seed=seed)

        if do_offloading:
            self.params["denoiser"] = move_params(self.params["denoiser"], "tpu")
        cached_delta = None
        for i in range(len(timesteps)):
            step_args = (
                self.params["denoiser"],
                latents,
                jnp.float32(sigmas[i]),
                jnp.float32(sigmas[i + 1]),
                embeddings,
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
