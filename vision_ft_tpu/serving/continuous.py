"""Step-level continuous batching for diffusion serving.

The reference server handles one generate() at a time
(/root/reference/tools/inference_server.py:19-136); our MicroBatcher
(tools/inference_server.py) improves on that by collating concurrent
identically-shaped requests into one batched generate(). But window
collation only wins when requests ALIGN: they must arrive within the
window, share every static parameter (size, step count), and then march
in lockstep to the end. Under staggered traffic the window stays empty
and the server degenerates to serial batch-1 calls.

Continuous batching schedules at STEP granularity instead — the
diffusion analogue of vLLM's token-level scheduling, natural on TPU
because XLA wants one fixed-shape program: every denoise step of every
request is the same compiled slot step over a fixed pool of S latent
rows, with per-request state reduced to per-slot VECTORS (timestep,
sigma, step index, guidance scales, active flag). A new request joins
the pool at any step boundary by overwriting a free row; a finished
request leaves the same way. Requests with different step counts, seeds
and guidance scales coexist in one batch; the device sees a constant
shape and never recompiles.

When to use it (r4 on-chip result, docs/PERFORMANCE.md): continuous
batching wins when per-request compute UNDER-uses the chip or when
requests must not wait for lockstep batch mates. On a single chip that
one request already saturates (e.g. Lumina2 at 512px), every pool tick
pays near-full-pool compute while slots sit idle between staggered
arrivals — the measured staggered trace ran 0.28x the window
scheduler's wall time. Prefer --scheduler window there.

The engine is family-agnostic: everything family-specific (prompt
encoding layout, scheduler tables, latent init, the jitted slot step,
VAE decode) lives behind a small adapter protocol —
:class:`SDXLSlotAdapter` (Euler-ancestral CFG, per-slot noise seeds) and
:class:`Lumina2SlotAdapter` (flow matching, renorm CFG + per-slot CFG
truncation) ship here; other families implement the same methods.

Adapter protocol (duck-typed):
  latent_shape, dtype            — one slot's latent row shape / dtype
  schedule(req)                  -> (timesteps (n,), sigmas (n+1,)) numpy
  encode(reqs)                   -> one opaque context row per request
  blank_context(num_slots)       -> device pytree holding all slots' rows
  write_slot(ctx, j, row)        -> ctx with slot j's row written
  scalar_fields()                -> {name: (default, np dtype)} per-slot tables
  request_scalars(req)           -> {name: value} for an admitted request
  init_latents(req, seed, sigmas)-> one latent row
  step_params()                  -> pytree of model weights the slot step
                                    reads (threaded through the jitted tick
                                    as an ARGUMENT — never closed over, so
                                    jit can't bake gigabytes of weights into
                                    the compiled tick as constants)
  slot_step(params, latents, ctx, t, sigma, next_sigma, idx, total,
            scalars, active)     -> new latents (ONE jitted device step)
  decode(latent_row)             -> image

Per-slot noise (SDXL) follows the exact ``PRNGKey(seed)`` /
``seed + 7919*(i+1)`` construction of the plain pipeline
(models/sdxl/pipeline.py ``_generate_core``), so a slot's output is
numerically identical to the same request run through batch-1
``generate()``.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp


@dataclass
class SlotRequest:
    """One generation request; the continuous-batching unit of work.

    A family-agnostic superset of knobs (like the server's
    GenerationParams): adapters read the fields they own and ignore the
    rest — cfg_rescale is SDXL's std-matching rescale, renorm_cfg /
    cfg_trunc_ratio are Lumina2's norm-matching renorm + early-schedule
    CFG skip.
    """

    prompt: str
    negative_prompt: str = ""
    num_inference_steps: int = 20
    cfg_scale: float = 3.5
    cfg_rescale: float = 0.0
    renorm_cfg: float = 1.0
    cfg_trunc_ratio: float = 0.0
    distilled_guidance: float = 1.0
    seed: Optional[int] = None


@dataclass
class _Pending:
    request: SlotRequest
    event: threading.Event = field(default_factory=threading.Event)
    image: object = None
    error: Optional[Exception] = None


class SDXLSlotAdapter:
    """Family adapter binding the engine to an SDXL pipeline.

    Context layout matches ``_denoise_step``'s CFG split: positive rows
    [0:S], negative rows [S:2S]. Per-step ancestral noise seeds derive
    from the per-slot base seed INSIDE the jitted step (same
    ``seed + 7919*(i+1)`` stream as batch-1 generate()).
    """

    def __init__(self, model, height: int, width: int,
                 max_token_length: int = 75):
        self.model = model
        self.height = height
        self.width = width
        self.max_token_length = max_token_length
        ratio = int(model.vae.compression_ratio)
        self.latent_shape = (
            height // ratio, width // ratio, model.denoiser.config.in_channels,
        )
        enc = jax.eval_shape(
            lambda: model.text_encoder.encode_prompts(
                model.params["text_encoder"], ["x"], ["y"],
                use_negative_prompts=True, max_token_length=max_token_length,
            )
        )
        emb, pooled = jax.eval_shape(
            lambda e: model.prepare_encoder_hidden_states(e, True), enc
        )
        self.emb_shape = emb.shape[1:]
        self.pooled_shape = pooled.shape[1:]
        self.dtype = model.dtype

    def schedule(self, request: SlotRequest):
        timesteps = self.model.scheduler.get_timesteps(
            request.num_inference_steps
        )
        sigmas = self.model.scheduler.get_sigmas(timesteps)
        return np.asarray(timesteps, np.float32), np.asarray(sigmas, np.float32)

    def scalar_fields(self):
        return {
            "cfg_scale": (1.0, np.float32),
            "cfg_rescale": (0.0, np.float32),
            "seed": (0, np.int64),
        }

    def request_scalars(self, request: SlotRequest):
        return {
            "cfg_scale": request.cfg_scale,
            "cfg_rescale": request.cfg_rescale,
            # seed is filled by the engine (it draws one if absent)
        }

    def encode(self, requests: list[SlotRequest]):
        """Batch-encode admissions; returns per-request
        (emb_pos, emb_neg, pooled_pos, pooled_neg) rows."""
        out = self.model.text_encoder.encode_prompts(
            self.model.params["text_encoder"],
            [r.prompt for r in requests],
            [r.negative_prompt or "" for r in requests],
            use_negative_prompts=True,
            max_token_length=self.max_token_length,
        )
        emb, pooled = self.model.prepare_encoder_hidden_states(out, True)
        emb = emb.astype(self.dtype)
        pooled = pooled.astype(self.dtype)
        n = len(requests)
        return [
            (emb[i], emb[n + i], pooled[i], pooled[n + i]) for i in range(n)
        ]

    def blank_context(self, num_slots: int):
        s = num_slots
        size = jnp.broadcast_to(
            jnp.asarray([self.height, self.width], jnp.float32), (2 * s, 2)
        )
        return {
            "emb": jnp.zeros((2 * s,) + tuple(self.emb_shape), self.dtype),
            "pooled": jnp.zeros((2 * s,) + tuple(self.pooled_shape), self.dtype),
            "original_size": size,
            "target_size": size,
            "crop_coords": jnp.zeros((2 * s, 2), jnp.float32),
        }

    def write_slot(self, ctx, j: int, row):
        e_pos, e_neg, p_pos, p_neg = row
        s = ctx["emb"].shape[0] // 2
        return {
            **ctx,
            "emb": ctx["emb"].at[j].set(e_pos).at[s + j].set(e_neg),
            "pooled": ctx["pooled"].at[j].set(p_pos).at[s + j].set(p_neg),
        }

    def init_latents(self, request: SlotRequest, seed: int,
                     sigmas: np.ndarray) -> jax.Array:
        """Slot row (h, w, c) — same stream as batch-1 prepare_latents
        row 0 (PRNGKey(seed + 0)), scaled to the schedule's max sigma."""
        from ..utils import tensor as tensor_utils

        noise = tensor_utils.incremental_seed_randn(
            (1,) + self.latent_shape, seed, dtype=self.dtype
        )[0]
        return noise * self.model.scheduler.get_max_noise_sigma(sigmas)

    def step_params(self):
        return self.model.params["denoiser"]

    def slot_step(self, params, latents, ctx, t, sigma, next_sigma, idx,
                  total, scalars, active):
        step = self.model._get_jit_slot_step()
        return step(
            params, latents, t, sigma, next_sigma,
            ctx["emb"], ctx["pooled"], ctx["original_size"],
            ctx["target_size"], ctx["crop_coords"],
            scalars["cfg_scale"], scalars["cfg_rescale"],
            scalars["seed"].astype(jnp.int32), idx, active,
        )

    def decode(self, latent_row: jax.Array):
        return self.model.decode_image(latent_row[None])[0]


class Lumina2SlotAdapter:
    """Family adapter binding the engine to a Lumina2 (NextDiT) pipeline.

    Flow matching: the per-slot step is a deterministic Euler update
    (no ancestral seeds), with Lumina2's distinctive CFG features as
    per-slot vectors — renorm CFG (norm-matching rescale) and CFG
    truncation (slots below their (i+1)/n > trunc_ratio threshold use
    the bare positive velocity). Caption features are re-refined every
    step instead of reusing generate()'s caption cache: the refinement
    is latent- and time-independent, so the math is identical (the
    parity test pins it).
    """

    def __init__(self, model, height: int, width: int,
                 max_token_length: Optional[int] = None):
        from ..models.lumina2.text_encoder import DEFAULT_MAX_TOKEN_LENGTH

        self.model = model
        self.height = height
        self.width = width
        self.max_token_length = max_token_length or DEFAULT_MAX_TOKEN_LENGTH
        ratio = int(model.vae.compression_ratio)
        self.latent_shape = (
            height // ratio, width // ratio, model.denoiser.config.in_channels,
        )
        enc = jax.eval_shape(
            lambda: model.text_encoder.encode_prompts(
                model.params["text_encoder"], ["x"], ["y"],
                use_negative_prompts=True,
                max_token_length=self.max_token_length,
            )
        )
        self.emb_shape = enc.positive_embeddings.shape[1:]
        self.mask_dtype = enc.positive_attention_mask.dtype
        self.dtype = model.dtype

    def schedule(self, request: SlotRequest):
        n = request.num_inference_steps
        timesteps = self.model.scheduler.get_timesteps(n)
        sigmas = self.model.scheduler.get_sigmas(n)
        return np.asarray(timesteps, np.float32), np.asarray(sigmas, np.float32)

    def scalar_fields(self):
        return {
            "cfg_scale": (1.0, np.float32),
            "renorm_cfg": (1.0, np.float32),
            "cfg_trunc_ratio": (0.0, np.float32),
        }

    def request_scalars(self, request: SlotRequest):
        return {
            "cfg_scale": request.cfg_scale,
            "renorm_cfg": request.renorm_cfg,
            "cfg_trunc_ratio": request.cfg_trunc_ratio,
        }

    def encode(self, requests: list[SlotRequest]):
        out = self.model.text_encoder.encode_prompts(
            self.model.params["text_encoder"],
            [r.prompt for r in requests],
            [r.negative_prompt or "" for r in requests],
            use_negative_prompts=True,
            max_token_length=self.max_token_length,
        )
        pos = out.positive_embeddings.astype(self.dtype)
        neg = out.negative_embeddings.astype(self.dtype)
        pos_m = out.positive_attention_mask
        neg_m = out.negative_attention_mask
        return [
            (pos[i], neg[i], pos_m[i], neg_m[i]) for i in range(len(requests))
        ]

    def blank_context(self, num_slots: int):
        s = num_slots
        return {
            "features": jnp.zeros((2 * s,) + tuple(self.emb_shape), self.dtype),
            "mask": jnp.zeros((2 * s,) + tuple(self.emb_shape[:-1]),
                              self.mask_dtype),
        }

    def write_slot(self, ctx, j: int, row):
        e_pos, e_neg, m_pos, m_neg = row
        s = ctx["features"].shape[0] // 2
        return {
            "features": ctx["features"].at[j].set(e_pos).at[s + j].set(e_neg),
            "mask": ctx["mask"].at[j].set(m_pos).at[s + j].set(m_neg),
        }

    def init_latents(self, request: SlotRequest, seed: int,
                     sigmas: np.ndarray) -> jax.Array:
        """Same stream as batch-1 prepare_latents row 0 (pure noise —
        flow matching starts at sigma=1)."""
        from ..utils import tensor as tensor_utils

        return tensor_utils.incremental_seed_randn(
            (1,) + self.latent_shape, seed, dtype=self.dtype
        )[0]

    def step_params(self):
        return self.model.params["denoiser"]

    def slot_step(self, params, latents, ctx, t, sigma, next_sigma, idx,
                  total, scalars, active):
        step = self.model._get_jit_slot_step()
        return step(
            params, latents, t, sigma, next_sigma,
            ctx["features"], ctx["mask"],
            scalars["cfg_scale"], scalars["renorm_cfg"],
            scalars["cfg_trunc_ratio"], idx, total, active,
        )

    def decode(self, latent_row: jax.Array):
        return self.model.decode_image(latent_row[None])[0]


class AuraFlowSlotAdapter:
    """Family adapter binding the engine to an AuraFlow (MMDiT) pipeline.

    Flow matching with plain CFG — no renorm, no truncation (the
    reference's AuraFlow pipeline has neither). The denoiser's time input
    IS the per-slot sigma, so the engine's ``t`` vector is ignored by the
    jitted step. Same shape as Lumina2SlotAdapter minus the attention
    mask (UMT5 features arrive already padded to max_token_length)."""

    def __init__(self, model, height: int, width: int,
                 max_token_length: Optional[int] = None):
        from ..models.auraflow.text_encoder import DEFAULT_MAX_TOKEN_LENGTH

        self.model = model
        self.height = height
        self.width = width
        self.max_token_length = max_token_length or DEFAULT_MAX_TOKEN_LENGTH
        ratio = int(model.vae.compression_ratio)
        self.latent_shape = (
            height // ratio, width // ratio, model.denoiser.config.in_channels,
        )
        enc = jax.eval_shape(
            lambda: model.text_encoder.encode_prompts(
                model.params["text_encoder"], ["x"], ["y"],
                use_negative_prompts=True,
                max_token_length=self.max_token_length,
            )
        )
        self.emb_shape = enc.positive_embeddings.shape[1:]
        self.dtype = model.dtype

    def schedule(self, request: SlotRequest):
        # pure accessor — never touches the scheduler's mutable
        # timesteps/sigmas attributes, which a concurrent generate() on
        # the same model rewrites via retrieve_timesteps
        timesteps, sigmas = self.model.scheduler.schedule_tables(
            request.num_inference_steps
        )
        return np.asarray(timesteps, np.float32), np.asarray(sigmas, np.float32)

    def scalar_fields(self):
        return {"cfg_scale": (1.0, np.float32)}

    def request_scalars(self, request: SlotRequest):
        return {"cfg_scale": request.cfg_scale}

    def encode(self, requests: list[SlotRequest]):
        out = self.model.text_encoder.encode_prompts(
            self.model.params["text_encoder"],
            [r.prompt for r in requests],
            [r.negative_prompt or "" for r in requests],
            use_negative_prompts=True,
            max_token_length=self.max_token_length,
        )
        pos = out.positive_embeddings.astype(self.dtype)
        neg = out.negative_embeddings.astype(self.dtype)
        return [(pos[i], neg[i]) for i in range(len(requests))]

    def blank_context(self, num_slots: int):
        s = num_slots
        return {
            "emb": jnp.zeros((2 * s,) + tuple(self.emb_shape), self.dtype),
        }

    def write_slot(self, ctx, j: int, row):
        e_pos, e_neg = row
        s = ctx["emb"].shape[0] // 2
        return {"emb": ctx["emb"].at[j].set(e_pos).at[s + j].set(e_neg)}

    def init_latents(self, request: SlotRequest, seed: int,
                     sigmas: np.ndarray) -> jax.Array:
        """Same stream as batch-1 prepare_latents row 0 (pure noise —
        AuraFlow's shifted schedule starts at sigma_max=1)."""
        from ..utils import tensor as tensor_utils

        return tensor_utils.incremental_seed_randn(
            (1,) + self.latent_shape, seed, dtype=self.dtype
        )[0]

    def step_params(self):
        return self.model.params["denoiser"]

    def slot_step(self, params, latents, ctx, t, sigma, next_sigma, idx,
                  total, scalars, active):
        step = self.model._get_jit_slot_step()
        return step(
            params, latents, t, sigma, next_sigma,
            ctx["emb"], scalars["cfg_scale"], active,
        )

    def decode(self, latent_row: jax.Array):
        return self.model.decode_image(latent_row[None])[0]


class CogView4SlotAdapter:
    """Family adapter binding the engine to a CogView4 (DiT) pipeline.

    Flow matching with plain CFG plus SDXL-style size conditioning
    (original/target/crop rows ride the context pytree). Schedule comes
    from the pipeline's pure ``prepare_timesteps`` (linear-time-shifted
    by the pool's fixed image size)."""

    def __init__(self, model, height: int, width: int,
                 max_token_length: Optional[int] = None):
        from ..models.cogview4.text_encoder import DEFAULT_MAX_TOKEN_LENGTH

        self.model = model
        self.height = height
        self.width = width
        self.max_token_length = max_token_length or DEFAULT_MAX_TOKEN_LENGTH
        ratio = int(model.vae.compression_ratio)
        self.latent_shape = (
            height // ratio, width // ratio, model.denoiser.config.in_channels,
        )
        enc = jax.eval_shape(
            lambda: model.text_encoder.encode_prompts(
                model.params["text_encoder"], ["x"], ["y"],
                use_negative_prompts=True,
                max_token_length=self.max_token_length,
            )
        )
        self.emb_shape = enc.positive_embeddings.shape[1:]
        self.dtype = model.dtype

    def schedule(self, request: SlotRequest):
        timesteps, sigmas = self.model.prepare_timesteps(
            request.num_inference_steps, self.height, self.width
        )
        return np.asarray(timesteps, np.float32), np.asarray(sigmas, np.float32)

    def scalar_fields(self):
        return {"cfg_scale": (1.0, np.float32)}

    def request_scalars(self, request: SlotRequest):
        return {"cfg_scale": request.cfg_scale}

    def encode(self, requests: list[SlotRequest]):
        out = self.model.text_encoder.encode_prompts(
            self.model.params["text_encoder"],
            [r.prompt for r in requests],
            [r.negative_prompt or "" for r in requests],
            use_negative_prompts=True,
            max_token_length=self.max_token_length,
        )
        pos = out.positive_embeddings.astype(self.dtype)
        neg = out.negative_embeddings.astype(self.dtype)
        return [(pos[i], neg[i]) for i in range(len(requests))]

    def blank_context(self, num_slots: int):
        s = num_slots
        size = jnp.broadcast_to(
            jnp.asarray([self.height, self.width], jnp.float32), (2 * s, 2)
        )
        return {
            "emb": jnp.zeros((2 * s,) + tuple(self.emb_shape), self.dtype),
            "original_size": size,
            "target_size": size,
            "crop_coords": jnp.zeros((2 * s, 2), jnp.float32),
        }

    def write_slot(self, ctx, j: int, row):
        e_pos, e_neg = row
        s = ctx["emb"].shape[0] // 2
        return {**ctx, "emb": ctx["emb"].at[j].set(e_pos).at[s + j].set(e_neg)}

    def init_latents(self, request: SlotRequest, seed: int,
                     sigmas: np.ndarray) -> jax.Array:
        """Same stream as batch-1 prepare_latents row 0 (pure noise —
        flow matching starts at sigma=1)."""
        from ..utils import tensor as tensor_utils

        return tensor_utils.incremental_seed_randn(
            (1,) + self.latent_shape, seed, dtype=self.dtype
        )[0]

    def step_params(self):
        return self.model.params["denoiser"]

    def slot_step(self, params, latents, ctx, t, sigma, next_sigma, idx,
                  total, scalars, active):
        step = self.model._get_jit_slot_step()
        return step(
            params, latents, t, sigma, next_sigma,
            ctx["emb"], ctx["original_size"], ctx["target_size"],
            ctx["crop_coords"], scalars["cfg_scale"], active,
        )

    def decode(self, latent_row: jax.Array):
        return self.model.decode_image(latent_row[None])[0]


class FluxSlotAdapter:
    """Family adapter binding the engine to a Flux (12B rectified-flow)
    pipeline.

    Flux's Euler delta is 1/num_steps — a per-slot constant derived from
    the engine's ``total`` vector, not a sigma difference — and its
    distilled guidance scalar rides the per-slot tables into the
    denoiser's guidance embedding. Context is the dual encoder pair
    (T5 sequence + CLIP pooled)."""

    def __init__(self, model, height: int, width: int,
                 max_token_length: Optional[int] = None):
        from ..models.flux.text_encoder import DEFAULT_T5_MAX_TOKEN_LENGTH

        self.model = model
        self.height = height
        self.width = width
        self.max_token_length = max_token_length or DEFAULT_T5_MAX_TOKEN_LENGTH
        ratio = int(model.vae.compression_ratio)
        self.latent_shape = (
            height // ratio, width // ratio, model.vae.config.latent_channels,
        )
        enc = jax.eval_shape(
            lambda: model.text_encoder.encode_prompts(
                model.params["text_encoder"], ["x"], ["y"],
                use_negative_prompts=True,
                t5_max_token_length=self.max_token_length,
            )
        )
        self.t5_shape = enc.t5.positive_embeddings.shape[1:]
        self.clip_shape = enc.clip.positive_embeddings.shape[1:]
        self.dtype = model.dtype

    def schedule(self, request: SlotRequest):
        from ..modules.timestep.scheduler import get_linear_schedule

        timesteps = get_linear_schedule(request.num_inference_steps)
        # the slot step derives its delta from the total vector; the
        # sigma table is bookkeeping only (engine requires n+1 rows)
        sigmas = np.concatenate([timesteps, [0.0]]).astype(np.float32)
        return np.asarray(timesteps, np.float32), sigmas

    def scalar_fields(self):
        return {
            "cfg_scale": (1.0, np.float32),
            "distilled_guidance": (1.0, np.float32),
        }

    def request_scalars(self, request: SlotRequest):
        return {
            "cfg_scale": request.cfg_scale,
            "distilled_guidance": request.distilled_guidance,
        }

    def encode(self, requests: list[SlotRequest]):
        out = self.model.text_encoder.encode_prompts(
            self.model.params["text_encoder"],
            [r.prompt for r in requests],
            [r.negative_prompt or "" for r in requests],
            use_negative_prompts=True,
            t5_max_token_length=self.max_token_length,
        )
        t5_pos = out.t5.positive_embeddings.astype(self.dtype)
        t5_neg = out.t5.negative_embeddings.astype(self.dtype)
        clip_pos = out.clip.positive_embeddings.astype(self.dtype)
        clip_neg = out.clip.negative_embeddings.astype(self.dtype)
        return [
            (t5_pos[i], t5_neg[i], clip_pos[i], clip_neg[i])
            for i in range(len(requests))
        ]

    def blank_context(self, num_slots: int):
        s = num_slots
        return {
            "t5": jnp.zeros((2 * s,) + tuple(self.t5_shape), self.dtype),
            "clip": jnp.zeros((2 * s,) + tuple(self.clip_shape), self.dtype),
        }

    def write_slot(self, ctx, j: int, row):
        t5_pos, t5_neg, clip_pos, clip_neg = row
        s = ctx["t5"].shape[0] // 2
        return {
            "t5": ctx["t5"].at[j].set(t5_pos).at[s + j].set(t5_neg),
            "clip": ctx["clip"].at[j].set(clip_pos).at[s + j].set(clip_neg),
        }

    def init_latents(self, request: SlotRequest, seed: int,
                     sigmas: np.ndarray) -> jax.Array:
        """Same stream as batch-1 prepare_latents row 0 (pure noise —
        rectified flow starts at t=1)."""
        from ..utils import tensor as tensor_utils

        return tensor_utils.incremental_seed_randn(
            (1,) + self.latent_shape, seed, dtype=self.dtype
        )[0]

    def step_params(self):
        return self.model.params["denoiser"]

    def slot_step(self, params, latents, ctx, t, sigma, next_sigma, idx,
                  total, scalars, active):
        step = self.model._get_jit_slot_step()
        return step(
            params, latents, t, total, ctx["t5"], ctx["clip"],
            scalars["distilled_guidance"], scalars["cfg_scale"], active,
        )

    def decode(self, latent_row: jax.Array):
        return self.model.decode_image(latent_row[None])[0]


class ContinuousBatcher:
    """Fixed-slot step-level scheduler.

    One worker thread owns the device state; ``submit`` blocks the
    calling (HTTP handler) thread until its image is ready, mirroring
    the MicroBatcher contract so the server can swap schedulers with a
    flag. Each loop iteration: admit queued requests into free slots
    (one batched text encode per admission group), run ONE jitted
    slot step over the pool, retire finished slots (batch-1 VAE
    decode each). The device program is compiled once per pool shape.
    """

    def __init__(self, adapter, num_slots: int = 4, max_steps: int = 50):
        self.adapter = adapter
        self.num_slots = num_slots
        self.max_steps = max_steps

        s = num_slots
        h, w, c = adapter.latent_shape
        self._latents = jnp.zeros((s, h, w, c), adapter.dtype)
        self._ctx = adapter.blank_context(s)

        # host mirrors for admission/retirement bookkeeping
        self._step_idx = np.zeros(s, np.int64)
        self._total = np.zeros(s, np.int64)
        self._active = np.zeros(s, bool)
        self._pending_by_slot: list[Optional[_Pending]] = [None] * s

        # DEVICE-resident per-slot state: a tick is ONE dispatch + ONE
        # small fetch. The first cut kept the schedule tables on host and
        # shipped six little arrays per tick — through the axon tunnel
        # each transfer pays a full round trip, and the measured
        # staggered trace spent ~1.1 s/tick on a ~0.1 s device step
        # (docs/PERFORMANCE.md "Continuous batching").
        self._d_t = jnp.zeros((s, max_steps), jnp.float32)
        self._d_sig = jnp.zeros((s, max_steps + 1), jnp.float32)
        self._d_idx = jnp.zeros(s, jnp.int32)
        self._d_total = jnp.ones(s, jnp.int32)
        self._d_active = jnp.zeros(s, bool)
        self._d_scalars = {
            name: jnp.asarray(np.full(s, default, dtype))
            for name, (default, dtype) in adapter.scalar_fields().items()
        }

        # Model weights are an ARGUMENT of the jitted tick, never a
        # closure: tracing through adapter.slot_step with the params
        # closed over bakes the full weight tree into the compiled
        # program as constants (measured r4: 5.13 GB of captured
        # constants for SDXL, duplicating the resident weights and
        # stalling compilation). step_params() returns the live pytree
        # by reference — no copy — and jit donates nothing, so the
        # only per-tick cost is pytree flattening.
        step_params = getattr(adapter, "step_params", None)
        self._params = step_params() if step_params is not None else None

        def _pool_tick(params, latents, ctx, t_tab, sig_tab, idx, total,
                       scalars, active):
            rows = jnp.arange(s)
            cidx = jnp.clip(idx, 0, jnp.maximum(total, 1) - 1)
            t = t_tab[rows, cidx]
            sigma = sig_tab[rows, cidx]
            next_sigma = sig_tab[rows, cidx + 1]
            new_lat = self._adapter_step(
                params, latents, ctx, t, sigma, next_sigma, cidx,
                jnp.maximum(total, 1), scalars, active,
            )
            return new_lat, jnp.where(active, idx + 1, idx)

        self._pool_tick_fn = _pool_tick  # un-jitted handle (tests)
        # adapters that RECORD their per-tick inputs (the scheduler-logic
        # test oracle) opt out of jit so values stay concrete
        self._pool_tick = (
            jax.jit(_pool_tick)
            if getattr(adapter, "jit_pool_tick", True)
            else _pool_tick
        )

        self._queue: list[_Pending] = []
        self._cv = threading.Condition()
        self._closed = False
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def _adapter_step(self, params, latents, ctx, t, sigma, next_sigma,
                      idx, total, scalars, active):
        """Dispatch to the adapter's slot step, tolerating legacy
        adapters whose ``slot_step`` predates the ``params`` argument
        (they close over their own weights; fine for model-free test
        adapters, a 5 GB constant-capture bug for real models)."""
        if getattr(self.adapter, "step_params", None) is not None:
            return self.adapter.slot_step(
                params, latents, ctx, t, sigma, next_sigma, idx, total,
                scalars, active,
            )
        return self.adapter.slot_step(
            latents, ctx, t, sigma, next_sigma, idx, total, scalars, active,
        )

    # -- public API ----------------------------------------------------------------

    def submit(self, request: SlotRequest):
        if request.num_inference_steps > self.max_steps:
            raise ValueError(
                f"num_inference_steps {request.num_inference_steps} exceeds "
                f"engine max_steps {self.max_steps}"
            )
        item = _Pending(request)
        with self._cv:
            if self._closed:
                raise RuntimeError("ContinuousBatcher is closed")
            self._queue.append(item)
            self._cv.notify()
        item.event.wait()
        if item.error is not None:
            raise item.error
        return item.image

    def close(self):
        with self._cv:
            self._closed = True
            self._cv.notify()
        self._worker.join(timeout=5.0)

    # -- worker --------------------------------------------------------------------

    def _admit(self):
        """Move queued requests into free slots (one batched encode)."""
        free = [j for j in range(self.num_slots) if not self._active[j]]
        with self._cv:
            take = min(len(free), len(self._queue))
            group = self._queue[:take]
            del self._queue[:take]
        if not group:
            return
        rows = self.adapter.encode([p.request for p in group])
        for pending, row in zip(group, rows):
            r = pending.request
            t_row, sig_row = self.adapter.schedule(r)
            n = len(t_row)
            if n > self.max_steps:
                # schedulers may emit MORE rows than num_inference_steps
                # (SDXL's integer step_ratio walk yields n+1 timesteps for
                # counts that don't divide 1000) — reject just this
                # request instead of overflowing the per-slot tables
                pending.error = ValueError(
                    f"schedule length {n} exceeds engine max_steps "
                    f"{self.max_steps} (num_inference_steps="
                    f"{r.num_inference_steps})"
                )
                pending.event.set()
                continue
            j = free.pop(0)
            row_t = np.zeros(self.max_steps, np.float32)
            row_t[:n] = t_row
            row_sig = np.zeros(self.max_steps + 1, np.float32)
            row_sig[: n + 1] = sig_row
            self._d_t = self._d_t.at[j].set(row_t)
            self._d_sig = self._d_sig.at[j].set(row_sig)
            self._d_idx = self._d_idx.at[j].set(0)
            self._d_total = self._d_total.at[j].set(n)
            self._step_idx[j] = 0
            self._total[j] = n
            scalars = dict(self.adapter.request_scalars(r))
            seed = r.seed if r.seed is not None else int(
                np.random.randint(0, 2**31 - 1)
            )
            if "seed" in self._d_scalars:
                scalars["seed"] = seed
            for name, value in scalars.items():
                self._d_scalars[name] = self._d_scalars[name].at[j].set(value)
            self._latents = self._latents.at[j].set(
                self.adapter.init_latents(r, seed, sig_row[: n + 1])
            )
            self._ctx = self.adapter.write_slot(self._ctx, j, row)
            self._d_active = self._d_active.at[j].set(True)
            self._active[j] = True
            self._pending_by_slot[j] = pending

    _BACKPRESSURE_TICKS = 4

    def _tick(self):
        """One pool step (a single device dispatch over device-resident
        per-slot state) + retire finished slots. Host step counters
        advance in lockstep with the device (each tick increments active
        slots by exactly one), so no per-tick fetch is needed; every few
        ticks we block on the device index vector so the dispatch queue
        cannot run unboundedly ahead of execution."""
        self._latents, self._d_idx = self._pool_tick(
            self._params, self._latents, self._ctx, self._d_t, self._d_sig,
            self._d_idx, self._d_total, self._d_scalars, self._d_active,
        )
        self._ticks = getattr(self, "_ticks", 0) + 1
        if self._ticks % self._BACKPRESSURE_TICKS == 0:
            jax.block_until_ready(self._d_idx)
        self._step_idx[self._active] += 1
        done = self._active & (self._step_idx >= self._total)
        for j in np.nonzero(done)[0]:
            pending = self._pending_by_slot[int(j)]
            self._pending_by_slot[int(j)] = None
            self._active[j] = False
            self._d_active = self._d_active.at[int(j)].set(False)
            try:
                pending.image = self.adapter.decode(self._latents[int(j)])
            except Exception as exc:  # deliver, don't kill the worker
                pending.error = exc
            pending.event.set()

    def _run(self):
        while True:
            with self._cv:
                while not self._queue and not self._active.any():
                    if self._closed:
                        return
                    self._cv.wait()
                if self._closed and not self._active.any() and not self._queue:
                    return
            try:
                self._admit()
                if self._active.any():
                    self._tick()
            except Exception as exc:
                # a failed step poisons every in-flight request: deliver the
                # error to all of them rather than hanging their submitters
                for j in range(self.num_slots):
                    pending = self._pending_by_slot[j]
                    if pending is not None:
                        pending.error = exc
                        pending.event.set()
                        self._pending_by_slot[j] = None
                        self._active[j] = False
                with self._cv:
                    for item in self._queue:
                        item.error = exc
                        item.event.set()
                    self._queue.clear()
                time.sleep(0.01)
