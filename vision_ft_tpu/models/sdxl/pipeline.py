"""SDXL pipeline: single-file checkpoint I/O + generate().

Behavioral spec: /root/reference/src/models/sdxl/pipeline.py. TPU-native
deltas:
- params are an explicit pytree (``model.params``), loaded straight from
  safetensors bytes into arrays of the execution dtype — the jax analogue
  of the reference's meta-device + assign load (pipeline.py:49-115).
- the denoiser step is jitted once per (batch, H, W) shape; the CFG
  double-batch, input scaling, CFG combine and Euler-ancestral update all
  live *inside* the compiled step so XLA fuses the whole loop body.
- latents are NHWC.
"""

from __future__ import annotations

import re
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ...utils.dtype import str_to_dtype as _str_to_dtype
import numpy as np
from PIL import Image

from ...utils import safetensors as st
from ...utils import tensor as tensor_utils
from ...utils.state_dict import (
    convert_open_clip_to_transformers,
    convert_transformers_to_open_clip,
)
from ..autoencoder import AutoencoderKL
from ..autoencoder.kl import SDXL_VAE_CONFIG
from .config import SDXLConfig
from .denoiser import Denoiser
from .scheduler import Scheduler
from .text_encoder import TextEncoder
from .util import convert_from_original_key, convert_to_original_key

_VAE_ATTN_WEIGHT = re.compile(r"vae\..*\.to_(q|k|v|out)\.(\d+\.)?weight$")


class SDXLModel:
    denoiser_class: type[Denoiser] = Denoiser
    text_encoder_class: type[TextEncoder] = TextEncoder

    def __init__(
        self,
        config: SDXLConfig,
        tokenizer=None,
        vae_config=None,
        text_encoder_config_1=None,
        text_encoder_config_2=None,
    ):
        self.config = config
        self.dtype = _str_to_dtype(config.dtype)
        backend = config.denoiser.attention_backend
        self.denoiser = self.denoiser_class(config.denoiser)
        self.vae = AutoencoderKL(vae_config or SDXL_VAE_CONFIG)
        if tokenizer is None:
            from ..text_encoders.auto_tokenizer import maybe_auto_tokenizer

            tokenizer = maybe_auto_tokenizer(config, family="clip")
        self.text_encoder = self.text_encoder_class(
            backend=backend,
            tokenizer=tokenizer,
            config_1=text_encoder_config_1,
            config_2=text_encoder_config_2,
        )
        self.scheduler = Scheduler()
        self.params: dict = {}

    # -- checkpoint I/O ------------------------------------------------------

    def load_state_dict(self, flat: dict[str, jax.Array]) -> None:
        """Load a flat *internal-key* state dict into self.params."""
        from ...nn import unflatten_params

        self.params = {
            "denoiser": unflatten_params(
                {k[len("denoiser."):]: v for k, v in flat.items() if k.startswith("denoiser.")}
            ),
            "vae": unflatten_params(
                {k[len("vae."):]: v for k, v in flat.items() if k.startswith("vae.")}
            ),
            "text_encoder": unflatten_params(
                {
                    k[len("text_encoder."):]: v
                    for k, v in flat.items()
                    if k.startswith("text_encoder.")
                }
            ),
        }

    def _from_checkpoint(self) -> None:
        state_dict = st.load_file(self.config.checkpoint_path, dtype=self.dtype)
        state_dict = {convert_from_original_key(k): v for k, v in state_dict.items()}

        # OpenCLIP -> transformers for text_encoder_2 (qkv split)
        te2 = convert_open_clip_to_transformers(
            {k: v for k, v in state_dict.items() if "text_encoder_2." in k}
        )
        state_dict = {
            **{k: v for k, v in state_dict.items() if "text_encoder_2." not in k},
            **te2,
        }
        # drop HF bookkeeping keys if present
        state_dict = {
            k: v for k, v in state_dict.items() if ".embeddings.position_ids" not in k
        }
        # sgm stores VAE attention as 1x1 convs; we use linears
        # (reference vae.py:52-63)
        state_dict = {
            k: (v[:, :, 0, 0] if _VAE_ATTN_WEIGHT.search(k) and v.ndim == 4 else v)
            for k, v in state_dict.items()
        }
        # prequantized (bnb/quanto) weights -> quant subtrees (reference
        # pipeline.py:74 replace_by_prequantized_weights)
        from ...modules.quant import convert_prequantized_state_dict

        state_dict = convert_prequantized_state_dict(state_dict)
        self.load_state_dict(state_dict)

    @classmethod
    def from_checkpoint(cls, config: SDXLConfig, tokenizer=None) -> "SDXLModel":
        model = cls(config, tokenizer=tokenizer)
        model._from_checkpoint()
        return model

    def init_params(self, key: jax.Array, dtype=None) -> None:
        """Random init (tests / training-from-scratch)."""
        dtype = dtype or self.dtype
        k1, k2, k3 = jax.random.split(key, 3)
        self.params = {
            "denoiser": self.denoiser.init(k1, dtype),
            "vae": self.vae.init(k2, dtype),
            "text_encoder": self.text_encoder.init(k3, dtype),
        }

    def state_dict(self) -> dict[str, jax.Array]:
        """Flat dict in the *original* (sgm single-file) key layout."""
        from ...nn import flatten_params

        flat = {}
        flat.update({f"denoiser.{k}": v for k, v in flatten_params(self.params["denoiser"]).items()})
        flat.update({f"vae.{k}": v for k, v in flatten_params(self.params["vae"]).items()})
        flat.update(
            {f"text_encoder.{k}": v for k, v in flatten_params(self.params["text_encoder"]).items()}
        )
        te2 = convert_transformers_to_open_clip(
            {k: v for k, v in flat.items() if k.startswith("text_encoder.text_encoder_2.")}
        )
        flat = {
            **{k: v for k, v in flat.items() if not k.startswith("text_encoder.text_encoder_2.")},
            **te2,
        }
        flat = {
            k: (v[:, :, None, None] if _VAE_ATTN_WEIGHT.search(k) and v.ndim == 2 else v)
            for k, v in flat.items()
        }
        return {convert_to_original_key(k): v for k, v in flat.items()}

    # -- latents / images ------------------------------------------------------

    def prepare_latents(
        self,
        batch_size: int,
        height: int,
        width: int,
        max_noise_sigma: float,
        seed: Optional[int] = None,
    ) -> jax.Array:
        ratio = int(self.vae.compression_ratio)
        shape = (
            batch_size,
            height // ratio,
            width // ratio,
            self.denoiser.config.in_channels,
        )
        noise = tensor_utils.incremental_seed_randn(shape, seed, dtype=self.dtype)
        return noise * max_noise_sigma

    def encode_image(self, image, key: Optional[jax.Array] = None) -> jax.Array:
        """PIL image(s) or NHWC array in [-1,1] -> scaled latents."""
        if isinstance(image, Image.Image):
            image = tensor_utils.images_to_tensor([image], self.dtype)
        elif isinstance(image, (list, tuple)):
            image = tensor_utils.images_to_tensor(list(image), self.dtype)
        dist = self.vae.encode(self.params["vae"], image.astype(self.dtype))
        z = dist.sample(key) if key is not None else dist.mode()
        return z * self.vae.scaling_factor

    def decode_image(self, latents: jax.Array, use_tiling: bool = False) -> list[Image.Image]:
        z = latents / self.vae.scaling_factor
        if use_tiling:
            image = self.vae.tiled_decode(self.params["vae"], z)
        else:
            image = self.vae.decode(self.params["vae"], z)
        return tensor_utils.tensor_to_images(image)

    # -- compiled denoise step ---------------------------------------------------

    def _denoise_step(
        self,
        params,
        latents,
        timestep,
        sigma,
        next_sigma,
        embeddings,
        pooled,
        original_size,
        target_size,
        crop_coords,
        cfg_scale,
        cfg_rescale,
        noise_seed,
        do_cfg: bool,
        cached_deep=None,
        refresh=None,
    ):
        """One Euler-ancestral CFG step — the jit unit. The ancestral
        fresh noise is drawn inside the jit from ``noise_seed`` (a device
        scalar; same incremental_seed_randn per-sample-seed values), so a
        generate() issues one dispatch per step instead of three.

        With ``cached_deep``/``refresh`` set this is a DeepCache step
        (denoiser.deepcache_forward): returns (latents, deep_feature)."""
        noise = tensor_utils._incremental_seed_randn_jit(
            noise_seed, latents.shape, jnp.float32
        )
        model_input = jnp.concatenate([latents, latents]) if do_cfg else latents
        model_input = self.scheduler.scale_model_input(model_input, sigma).astype(
            latents.dtype
        )
        batch = model_input.shape[0]
        deep_cache = cached_deep is not None
        if deep_cache:
            noise_pred, new_deep = self.denoiser.deepcache_forward(
                params,
                model_input,
                jnp.broadcast_to(timestep, (batch,)),
                embeddings,
                pooled,
                original_size,
                target_size,
                crop_coords,
                cached_deep=cached_deep,
                refresh=refresh,
            )
        else:
            noise_pred = self.denoiser(
                params,
                model_input,
                jnp.broadcast_to(timestep, (batch,)),
                embeddings,
                pooled,
                original_size,
                target_size,
                crop_coords,
            )
        if do_cfg:
            positive, negative = jnp.split(noise_pred, 2)
            noise_pred = negative + cfg_scale * (positive - negative)
            # CFG rescale (Lin et al. 2023, arXiv:2305.08891 §3.4 —
            # beyond the reference): re-match the guided prediction's
            # per-sample std to the positive branch's, blending by
            # cfg_rescale (0 = off). Counters the overexposure high
            # guidance scales cause on zero-terminal-SNR models.
            axes = tuple(range(1, noise_pred.ndim))
            std_pos = jnp.std(positive, axis=axes, keepdims=True)
            std_cfg = jnp.std(noise_pred, axis=axes, keepdims=True)
            rescaled = noise_pred * (std_pos / jnp.maximum(std_cfg, 1e-6))
            noise_pred = cfg_rescale * rescaled + (1.0 - cfg_rescale) * noise_pred
        new_latents = self.scheduler.ancestral_step(
            latents.astype(jnp.float32),
            noise_pred.astype(jnp.float32),
            sigma,
            next_sigma,
            noise,
        )
        new_latents = new_latents.astype(latents.dtype)
        if deep_cache:
            return new_latents, new_deep
        return new_latents

    def _get_jit_step(self, do_cfg: bool):
        from ...nn.core import cached_jit

        return cached_jit(
            self, f"step_{do_cfg}", partial(self._denoise_step, do_cfg=do_cfg)
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
        pooled,         # (2S, P)
        original_size,  # (2S, 2)
        target_size,    # (2S, 2)
        crop_coords,    # (2S, 2)
        cfg_scale,      # (S,) f32 — per-request guidance
        cfg_rescale,    # (S,) f32
        seeds,          # (S,) i32 — per-slot base noise seeds
        step_idx,       # (S,) i32 — per-slot denoise-step index
        active,         # (S,) bool — inactive rows keep their latents
    ):
        """One CFG Euler-ancestral step over a SLOT POOL: every per-request
        scalar of :meth:`_denoise_step` is a per-slot vector, so requests at
        DIFFERENT denoise steps (and with different guidance/step counts)
        ride the same compiled program in one batch. This is the jit unit of
        step-level continuous batching (vision_ft_tpu.serving.continuous):
        requests join/leave the pool at step boundaries instead of waiting
        for a window of identically-shaped requests. Each slot's step-i
        ancestral noise draws from ``PRNGKey((seed + 7919*(i+1)) mod 2^31)``
        — the exact stream of the plain batch-1 ``generate()`` (i32 wraparound
        here equals the host's int64-then-mask arithmetic: both keep the low
        31 bits)."""
        expand = lambda v: v[:, None, None, None]
        step_seeds = (
            seeds + jnp.int32(7919) * (step_idx + 1)
        ) & jnp.int32(0x7FFFFFFF)
        noise = jax.vmap(
            lambda s: jax.random.normal(
                jax.random.PRNGKey(s), latents.shape[1:], jnp.float32
            )
        )(step_seeds)
        model_input = jnp.concatenate([latents, latents])
        sig2 = jnp.concatenate([sigma, sigma])
        model_input = self.scheduler.scale_model_input(
            model_input, expand(sig2)
        ).astype(latents.dtype)
        t2 = jnp.concatenate([timestep, timestep])
        noise_pred = self.denoiser(
            params, model_input, t2, embeddings, pooled,
            original_size, target_size, crop_coords,
        )
        positive, negative = jnp.split(noise_pred, 2)
        noise_pred = negative + expand(cfg_scale) * (positive - negative)
        axes = tuple(range(1, noise_pred.ndim))
        std_pos = jnp.std(positive, axis=axes, keepdims=True)
        std_cfg = jnp.std(noise_pred, axis=axes, keepdims=True)
        rescaled = noise_pred * (std_pos / jnp.maximum(std_cfg, 1e-6))
        cr = expand(cfg_rescale)
        noise_pred = cr * rescaled + (1.0 - cr) * noise_pred
        new_latents = self.scheduler.ancestral_step(
            latents.astype(jnp.float32),
            noise_pred.astype(jnp.float32),
            expand(sigma),
            expand(next_sigma),
            noise,
        ).astype(latents.dtype)
        return jnp.where(expand(active), new_latents, latents)

    def _get_jit_slot_step(self):
        from ...nn.core import cached_jit

        return cached_jit(self, "slot_step", self._slot_step)

    def _denoise_loop(
        self, params, latents, timesteps, sigmas, next_sigmas, seeds,
        embeddings, pooled, original_size, target_size, crop_coords,
        cfg_scale, cfg_rescale, do_cfg: bool,
        deep_cache_interval: Optional[int] = None,
    ):
        """The whole sampling loop as ONE device program (lax.scan over
        the per-step scalars). A 20-step generate is a single dispatch:
        through remote/tunneled runtimes each jitted call costs ~5 ms of
        RPC latency, so scanning on device recovers ~100 ms per generate
        and is the XLA-idiomatic loop form anyway.

        ``deep_cache_interval=N`` enables DeepCache: a full UNet pass
        every N steps, shallow-blocks-only passes (reusing the cached
        deep feature) in between — only one cond branch executes per
        step, so cached steps really skip the deep compute."""
        if deep_cache_interval:
            n = timesteps.shape[0]
            refresh = (jnp.arange(n) % deep_cache_interval) == 0
            batch = latents.shape[0] * (2 if do_cfg else 1)

            def _deep_shape():
                mi = jnp.zeros((batch,) + latents.shape[1:], latents.dtype)
                return self.denoiser.deepcache_forward(
                    params, mi, jnp.zeros((batch,)), embeddings, pooled,
                    original_size, target_size, crop_coords,
                    cached_deep=None, refresh=jnp.array(True),
                )[1]

            ds = jax.eval_shape(_deep_shape)
            deep0 = jnp.zeros(ds.shape, ds.dtype)

            def body(carry, per_step):
                lat, deep = carry
                t, sigma, next_sigma, seed, rf = per_step
                lat, deep = self._denoise_step(
                    params, lat, t, sigma, next_sigma, embeddings, pooled,
                    original_size, target_size, crop_coords, cfg_scale,
                    cfg_rescale, seed,
                    do_cfg=do_cfg, cached_deep=deep, refresh=rf,
                )
                return (lat, deep), None

            (latents, _), _ = jax.lax.scan(
                body, (latents, deep0),
                (timesteps, sigmas, next_sigmas, seeds, refresh),
            )
            return latents

        def body(latents, per_step):
            t, sigma, next_sigma, seed = per_step
            new = self._denoise_step(
                params, latents, t, sigma, next_sigma, embeddings, pooled,
                original_size, target_size, crop_coords, cfg_scale,
                cfg_rescale, seed,
                do_cfg=do_cfg,
            )
            return new, None

        latents, _ = jax.lax.scan(
            body, latents, (timesteps, sigmas, next_sigmas, seeds)
        )
        return latents

    def _get_jit_loop(self, do_cfg: bool, deep_cache_interval: Optional[int] = None):
        from ...nn.core import cached_jit

        return cached_jit(
            self, f"loop_{do_cfg}_{deep_cache_interval}",
            partial(self._denoise_loop, do_cfg=do_cfg,
                    deep_cache_interval=deep_cache_interval),
        )

    # -- generate ------------------------------------------------------------

    def generate(
        self,
        prompt,
        negative_prompt=None,
        width: int = 768,
        height: int = 768,
        original_size: Optional[tuple[int, int]] = None,
        target_size: Optional[tuple[int, int]] = None,
        crop_coords_top_left: tuple[int, int] = (0, 0),
        num_inference_steps: int = 20,
        cfg_scale: float = 3.5,
        cfg_rescale: float = 0.0,
        max_token_length: int = 75,
        seed: Optional[int] = None,
        deep_cache_interval: Optional[int] = None,
        do_offloading: bool = False,
    ) -> list[Image.Image]:
        do_cfg = cfg_scale > 1.0
        timesteps = self.scheduler.get_timesteps(num_inference_steps)
        sigmas = self.scheduler.get_sigmas(timesteps)
        batch_size = len(prompt) if isinstance(prompt, (list, tuple)) else 1
        original_size = original_size or (height, width)
        target_size = target_size or (height, width)
        should_tile = max(height, width) >= 1536

        from ...modules.offload import stage_on_device

        with stage_on_device(self.params, "text_encoder", do_offloading):
            encoder_output = self.text_encoder.encode_prompts(
                self.params["text_encoder"],
                prompt,
                negative_prompt,
                use_negative_prompts=do_cfg,
                max_token_length=max_token_length,
            )
        embeddings, pooled = self.prepare_encoder_hidden_states(encoder_output, do_cfg)
        return self._generate_core(
            embeddings, pooled, batch_size, height, width,
            original_size, target_size, crop_coords_top_left,
            timesteps, sigmas, cfg_scale, do_cfg, seed, should_tile,
            deep_cache_interval=deep_cache_interval,
            cfg_rescale=cfg_rescale,
            do_offloading=do_offloading,
        )

    def _generate_core(
        self, embeddings, pooled, batch_size, height, width,
        original_size, target_size, crop_coords_top_left,
        timesteps, sigmas, cfg_scale, do_cfg, seed, should_tile,
        deep_cache_interval: Optional[int] = None,
        cfg_rescale: float = 0.0,
        do_offloading: bool = False,
    ) -> list[Image.Image]:
        """The denoise loop shared by the base model and the context-level
        adapters (PFG / style tokenizer), which only differ in how
        ``embeddings`` is produced."""
        embeddings = embeddings.astype(self.dtype)
        pooled = pooled.astype(self.dtype)

        latents = self.prepare_latents(
            batch_size, height, width, self.scheduler.get_max_noise_sigma(sigmas), seed
        )

        cond_batch = embeddings.shape[0]
        sizes = lambda t: jnp.broadcast_to(jnp.asarray(t, jnp.float32), (cond_batch, 2))
        original_size_t = sizes(original_size)
        target_size_t = sizes(target_size)
        crop_t = sizes(crop_coords_top_left)

        from ...modules.offload import move_params

        if do_offloading:
            self.params["denoiser"] = move_params(self.params["denoiser"], "tpu")
        loop = self._get_jit_loop(do_cfg, deep_cache_interval)
        noise_seed = seed if seed is not None else int(np.random.randint(0, 2**31 - 1))
        n = len(timesteps)
        latents = loop(
            self.params["denoiser"],
            latents,
            jnp.asarray(np.asarray(timesteps, np.float32)),
            jnp.asarray(np.asarray(sigmas[:n], np.float32)),
            jnp.asarray(np.asarray(sigmas[1 : n + 1], np.float32)),
            jnp.asarray(
                [(noise_seed + 7919 * (i + 1)) & 0x7FFFFFFF for i in range(n)],
                jnp.int32,
            ),
            embeddings,
            pooled,
            original_size_t,
            target_size_t,
            crop_t,
            jnp.float32(cfg_scale),
            jnp.float32(cfg_rescale),
        )

        if do_offloading:
            from ...modules.offload import stage_on_device

            self.params["denoiser"] = move_params(self.params["denoiser"], "cpu")
            with stage_on_device(self.params, "vae", True):
                return self.decode_image(latents, use_tiling=should_tile)
        return self.decode_image(latents, use_tiling=should_tile)

    def prepare_encoder_hidden_states(self, encoder_output, do_cfg: bool):
        """cat(te1 768, te2 1280) -> 2048-d context; CFG batch-double
        [positive; negative] (reference pipeline.py:239-284)."""
        te1, te2 = encoder_output.text_encoder_1, encoder_output.text_encoder_2
        positive = jnp.concatenate([te1.positive_embeddings, te2.positive_embeddings], axis=-1)
        if do_cfg:
            negative = jnp.concatenate(
                [te1.negative_embeddings, te2.negative_embeddings], axis=-1
            )
            embeddings = jnp.concatenate([positive, negative], axis=0)
            pooled = jnp.concatenate(
                [te2.pooled_positive_embeddings, te2.pooled_negative_embeddings], axis=0
            )
        else:
            embeddings = positive
            pooled = te2.pooled_positive_embeddings
        return embeddings, pooled
