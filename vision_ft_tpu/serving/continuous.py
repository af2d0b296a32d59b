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
request is the same compiled ``_slot_step`` over a fixed pool of S
latent rows, with per-request state reduced to per-slot VECTORS
(timestep, sigma, guidance scale, noise seed, active flag). A new
request joins the pool at any step boundary by overwriting a free row;
a finished request leaves the same way. Requests with different step
counts, seeds and guidance scales coexist in one batch; the device sees
a constant shape and never recompiles.

Per-slot noise follows the exact ``PRNGKey(seed)`` / ``seed + 7919*(i+1)``
construction of the plain pipeline (models/sdxl/pipeline.py
``_generate_core``), so a slot's output is numerically identical to the
same request run through batch-1 ``generate()``.
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
    """One generation request; the continuous-batching unit of work."""

    prompt: str
    negative_prompt: str = ""
    num_inference_steps: int = 20
    cfg_scale: float = 3.5
    cfg_rescale: float = 0.0
    seed: Optional[int] = None


@dataclass
class _Pending:
    request: SlotRequest
    event: threading.Event = field(default_factory=threading.Event)
    image: object = None
    error: Optional[Exception] = None


class SDXLSlotAdapter:
    """Family adapter binding the engine to an SDXL pipeline.

    Owns everything family-specific: prompt encoding layout (positive
    rows [0:S], negative rows [S:2S], matching ``_denoise_step``'s CFG
    split), the scheduler tables, latent init, the jitted slot step and
    the VAE decode. Other families implement the same five methods.
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

    # -- schedule -----------------------------------------------------------------

    def schedule(self, request: SlotRequest):
        """(timesteps (n,), sigmas (n+1,), max_noise_sigma) for a request."""
        timesteps = self.model.scheduler.get_timesteps(
            request.num_inference_steps
        )
        sigmas = self.model.scheduler.get_sigmas(timesteps)
        return (
            np.asarray(timesteps, np.float32),
            np.asarray(sigmas, np.float32),
            self.model.scheduler.get_max_noise_sigma(sigmas),
        )

    # -- per-request rows ----------------------------------------------------------

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

    def init_latents(self, seed: int, max_noise_sigma: float) -> jax.Array:
        """Slot row (h, w, c) — same stream as batch-1 prepare_latents
        row 0 (PRNGKey(seed + 0))."""
        from ..utils import tensor as tensor_utils

        noise = tensor_utils.incremental_seed_randn(
            (1,) + self.latent_shape, seed, dtype=self.dtype
        )[0]
        return noise * max_noise_sigma

    # -- device step / decode --------------------------------------------------------

    def slot_step(self, latents, t, sigma, next_sigma, emb, pooled, sizes,
                  cfg_scale, cfg_rescale, step_seeds, active):
        step = self.model._get_jit_slot_step()
        original, target, crop = sizes
        return step(
            self.model.params["denoiser"], latents, t, sigma, next_sigma,
            emb, pooled, original, target, crop,
            cfg_scale, cfg_rescale, step_seeds, active,
        )

    def make_sizes(self, num_slots: int):
        """(original_size, target_size, crop_coords), each (2S, 2)."""
        size = jnp.broadcast_to(
            jnp.asarray([self.height, self.width], jnp.float32),
            (2 * num_slots, 2),
        )
        crop = jnp.zeros((2 * num_slots, 2), jnp.float32)
        return size, size, crop

    def decode(self, latent_row: jax.Array):
        return self.model.decode_image(latent_row[None])[0]


class ContinuousBatcher:
    """Fixed-slot step-level scheduler.

    One worker thread owns the device state; ``submit`` blocks the
    calling (HTTP handler) thread until its image is ready, mirroring
    the MicroBatcher contract so the server can swap schedulers with a
    flag. Each loop iteration: admit queued requests into free slots
    (one batched text encode per admission group), run ONE jitted
    ``_slot_step`` over the pool, retire finished slots (batch-1 VAE
    decode each). The device program is compiled once per pool shape.
    """

    def __init__(self, adapter, num_slots: int = 4, max_steps: int = 50):
        self.adapter = adapter
        self.num_slots = num_slots
        self.max_steps = max_steps

        s = num_slots
        h, w, c = adapter.latent_shape
        self._latents = jnp.zeros((s, h, w, c), adapter.dtype)
        self._emb = jnp.zeros((2 * s,) + tuple(adapter.emb_shape), adapter.dtype)
        self._pooled = jnp.zeros((2 * s,) + tuple(adapter.pooled_shape),
                                 adapter.dtype)
        self._sizes = adapter.make_sizes(s)

        # host-side per-slot tables (tiny; gathered into vectors per tick)
        self._t_table = np.zeros((s, max_steps), np.float32)
        self._sig_table = np.zeros((s, max_steps + 1), np.float32)
        self._step_idx = np.zeros(s, np.int64)
        self._total = np.zeros(s, np.int64)
        self._seeds = np.zeros(s, np.int64)
        self._cfg = np.ones(s, np.float32)
        self._crescale = np.zeros(s, np.float32)
        self._active = np.zeros(s, bool)
        self._pending_by_slot: list[Optional[_Pending]] = [None] * s

        self._queue: list[_Pending] = []
        self._cv = threading.Condition()
        self._closed = False
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

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
        s = self.num_slots
        for pending, (e_pos, e_neg, p_pos, p_neg) in zip(group, rows):
            j = free.pop(0)
            r = pending.request
            t_row, sig_row, max_sig = self.adapter.schedule(r)
            n = len(t_row)
            self._t_table[j, :n] = t_row
            self._sig_table[j, : n + 1] = sig_row
            seed = r.seed if r.seed is not None else int(
                np.random.randint(0, 2**31 - 1)
            )
            self._seeds[j] = seed
            self._step_idx[j] = 0
            self._total[j] = n
            self._cfg[j] = r.cfg_scale
            self._crescale[j] = r.cfg_rescale
            self._latents = self._latents.at[j].set(
                self.adapter.init_latents(seed, max_sig)
            )
            self._emb = self._emb.at[j].set(e_pos).at[s + j].set(e_neg)
            self._pooled = self._pooled.at[j].set(p_pos).at[s + j].set(p_neg)
            self._active[j] = True
            self._pending_by_slot[j] = pending

    def _tick(self):
        """One pool step + retire finished slots."""
        idx = np.minimum(self._step_idx, self._total - 1).clip(min=0)
        rows = np.arange(self.num_slots)
        t = self._t_table[rows, idx]
        sigma = self._sig_table[rows, idx]
        next_sigma = self._sig_table[rows, idx + 1]
        step_seeds = ((self._seeds + 7919 * (idx + 1)) & 0x7FFFFFFF).astype(
            np.int32
        )
        self._latents = self.adapter.slot_step(
            self._latents,
            jnp.asarray(t), jnp.asarray(sigma), jnp.asarray(next_sigma),
            self._emb, self._pooled, self._sizes,
            jnp.asarray(self._cfg), jnp.asarray(self._crescale),
            jnp.asarray(step_seeds), jnp.asarray(self._active),
        )
        self._step_idx[self._active] += 1
        done = self._active & (self._step_idx >= self._total)
        for j in np.nonzero(done)[0]:
            pending = self._pending_by_slot[int(j)]
            self._pending_by_slot[int(j)] = None
            self._active[j] = False
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
