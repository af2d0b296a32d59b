"""Wan 2.2 pipeline — three-file checkpoint I/O + flow-match Euler video
generation (reference src/models/wan/pipeline.py, 437 LoC).

Differences from the reference driven by XLA:
- The reference carries ragged nested tensors through the denoiser
  (pipeline.py:247-254, 372); we keep dense (B, Lc, D) context and zero
  out masked positions, which is exactly what the reference's
  strip-then-zero-repad produces once the denoiser pads to ``text_len``.
- Each denoise step is one jitted program (CFG concat, forward, guidance
  mix, Euler update) with static shapes; the Python loop over steps
  re-enters the same compiled executable.
- The VAE is injectable (the reference's is the external diffusers
  AutoencoderKLWan, vae.py:136); anything implementing
  encode/decode over NFHWC works.
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
from .config import WanConfig
from .denoiser import Denoiser
from .scheduler import Scheduler
from .text_encoder import DEFAULT_MAX_TOKEN_LENGTH, TextEncoder, TextEncoderConfig
from .util import convert_from_original_key, convert_to_original_key
from .vae import VAE
from .vae3d import CausalVAE


class Wan22:
    denoiser_class: type[Denoiser] = Denoiser
    text_encoder_class: type[TextEncoder] = TextEncoder
    # the native 3D causal VAE (vae3d.py); any object implementing the
    # VAE protocol (encode/decode over NFHWC) can be injected instead
    vae_class: type[VAE] = CausalVAE

    def __init__(
        self,
        config: WanConfig,
        tokenizer=None,
        text_encoder_config: Optional[TextEncoderConfig] = None,
        vae: Optional[VAE] = None,
    ):
        self.config = config
        self.dtype = _str_to_dtype(config.dtype)
        self.denoiser = self.denoiser_class(config.denoiser)
        if tokenizer is None:
            from ..text_encoders.auto_tokenizer import maybe_auto_tokenizer

            tokenizer = maybe_auto_tokenizer(config, family="t5")
        self.text_encoder = self.text_encoder_class(
            config=text_encoder_config, tokenizer=tokenizer
        )
        self.vae = vae if vae is not None else self.vae_class.from_default()
        self.scheduler = Scheduler()
        self.params: dict = {}

    @classmethod
    def from_config(cls, config: WanConfig, **kwargs) -> "Wan22":
        return cls(config, **kwargs)

    # -- checkpoint I/O ------------------------------------------------------

    def _from_checkpoint(self) -> None:
        """Load the three separate safetensors files
        (reference pipeline.py:53-94)."""
        from ...modules.quant import convert_prequantized_state_dict

        denoiser_sd = st.load_file(self.config.denoiser_path, dtype=self.dtype)
        denoiser_sd = {
            convert_from_original_key(k, "denoiser"): v for k, v in denoiser_sd.items()
        }
        self.params["denoiser"] = unflatten_params(
            convert_prequantized_state_dict(denoiser_sd)
        )

        te_sd = st.load_file(self.config.text_encoder_path, dtype=self.dtype)
        te_sd = {
            convert_from_original_key(k, "text_encoder"): v for k, v in te_sd.items()
        }
        self.params["text_encoder"] = unflatten_params(
            convert_prequantized_state_dict(te_sd)
        )

        if hasattr(self.vae, "load_state_dict"):
            vae_sd = st.load_file(self.config.vae_path, dtype=self.dtype)
            self.vae.load_state_dict(
                {convert_from_original_key(k, "vae"): v for k, v in vae_sd.items()}
            )

    @classmethod
    def from_checkpoint(cls, config: WanConfig, **kwargs) -> "Wan22":
        model = cls(config, **kwargs)
        model._from_checkpoint()
        return model

    def init_params(self, key: jax.Array, dtype=None) -> None:
        dtype = dtype or self.dtype
        k1, k2 = jax.random.split(key)
        self.params = {
            "denoiser": self.denoiser.init(k1, dtype),
            "text_encoder": self.text_encoder.init(k2, dtype),
        }

    def denoiser_state_dict(self) -> dict[str, jax.Array]:
        return {
            convert_to_original_key(k, "denoiser"): v
            for k, v in flatten_params(self.params["denoiser"]).items()
        }

    def text_encoder_state_dict(self) -> dict[str, jax.Array]:
        return {
            convert_to_original_key(k, "text_encoder"): v
            for k, v in flatten_params(self.params["text_encoder"]).items()
        }

    # -- latents -------------------------------------------------------------

    def prepare_latents(
        self,
        batch_size: int,
        frames: int,
        height: int,
        width: int,
        seed: Optional[int] = None,
    ) -> jax.Array:
        """NFHWC noise; frame/space compression per reference
        pipeline.py:108-153."""
        tcr = self.vae.temporal_compression_ratio
        scr = self.vae.spatial_compression_ratio
        frames = frames // tcr * tcr
        shape = (
            batch_size,
            (frames - 1) // tcr + 1,
            height // scr,
            width // scr,
            self.denoiser.config.in_channels,
        )
        pf, ph, pw = self.denoiser.patch_size
        assert shape[1] % pf == 0 and shape[2] % ph == 0 and shape[3] % pw == 0, (
            f"latent grid {shape[1:4]} must be divisible by patch {self.denoiser.patch_size}"
        )
        return tensor_utils.incremental_seed_randn(shape, seed, dtype=self.dtype)

    def encode_video(self, video, key: Optional[jax.Array] = None) -> jax.Array:
        if isinstance(video, Image.Image):
            video = [[video]]
        elif isinstance(video, (list, tuple)) and isinstance(video[0], Image.Image):
            video = [list(video)]
        if isinstance(video, (list, tuple)):
            video = tensor_utils.videos_to_tensor(list(video), self.dtype)
        raw = self.vae.encode(video)
        return self.vae.normalize_latents(raw)

    def decode_videos(self, latents: jax.Array) -> list[list[Image.Image]]:
        video = self.vae.decode(self.vae.denormalize_latents(latents))
        return tensor_utils.tensor_to_videos(video)

    # -- compiled step --------------------------------------------------------

    def _denoise_step(
        self, params, latents, timestep, sigma, next_sigma, context, cfg_scale,
        cached_delta=None, do_cfg: bool = False, deep_cache: bool = False,
        refresh: bool = True, cache_depth=None,
    ):
        model_input = jnp.concatenate([latents, latents]) if do_cfg else latents
        batch = model_input.shape[0]
        t = jnp.broadcast_to(timestep, (batch,))
        if deep_cache:
            velocity, delta = self.denoiser.deepcache_forward(
                params, model_input, t, context, cached_delta=cached_delta,
                refresh=refresh, cache_depth=cache_depth,
            )
        else:
            velocity = self.denoiser(params, model_input, t, context)
            delta = None
        if do_cfg:
            positive, negative = jnp.split(velocity, 2)
            velocity = negative + (positive - negative) * cfg_scale
        new_latents = latents.astype(jnp.float32) + velocity * (next_sigma - sigma)
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

    # -- generate -------------------------------------------------------------

    def generate(
        self,
        prompt,
        negative_prompt=None,
        frames: int = 16,
        width: int = 768,
        height: int = 768,
        num_inference_steps: int = 25,
        cfg_scale: float = 5.0,
        max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH,
        seed: Optional[int] = None,
        do_offloading: bool = False,
        deep_cache_interval: Optional[int] = None,
        deep_cache_depth: Optional[int] = None,
    ) -> list[list[Image.Image]]:
        do_cfg = cfg_scale > 1.0
        prompts = list(prompt) if isinstance(prompt, (list, tuple)) else [prompt]
        batch_size = len(prompts)

        timesteps = self.scheduler.get_timesteps(num_inference_steps)
        sigmas = self.scheduler.get_sigmas(num_inference_steps)

        from ...modules.offload import move_params, stage_on_device

        with stage_on_device(self.params, "text_encoder", do_offloading):
            encoder_output = self.text_encoder.encode_prompts(
                self.params["text_encoder"],
                prompts,
                negative_prompt,
                use_negative_prompts=do_cfg,
                max_token_length=max_token_length,
            )
        if do_cfg:
            embeddings = jnp.concatenate(
                [encoder_output.positive_embeddings, encoder_output.negative_embeddings]
            )
            mask = jnp.concatenate(
                [
                    encoder_output.positive_attention_mask,
                    encoder_output.negative_attention_mask,
                ]
            )
        else:
            embeddings = encoder_output.positive_embeddings
            mask = encoder_output.positive_attention_mask
        # strip-then-zero-repad (reference pipeline.py:247-254 + denoiser
        # padding): masked positions become zero vectors
        context = (embeddings * mask[:, :, None].astype(embeddings.dtype)).astype(
            self.dtype
        )

        latents = self.prepare_latents(batch_size, frames, height, width, seed=seed)

        if do_offloading:
            self.params["denoiser"] = move_params(self.params["denoiser"], "tpu")
        cached_delta = None
        for i, t in enumerate(timesteps):
            step_args = (
                self.params["denoiser"], latents, jnp.float32(t),
                jnp.float32(sigmas[i]), jnp.float32(sigmas[i + 1]),
                context, jnp.float32(cfg_scale),
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
        return self.decode_videos(latents)
