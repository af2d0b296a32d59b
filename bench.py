"""Driver benchmark: full-size SDXL UNet denoiser step on one TPU chip.

Measures the innermost hot path of both training and inference (SURVEY.md
§3.1/§3.2): one CFG denoise forward at 1024px (2x128x128x4 latents, 77-token
context, bf16). Prints ONE JSON line.

vs_baseline: A100 + flash-attn runs the SDXL UNet forward at roughly 10
CFG-steps/s at 1024px batch 1 (diffusers 20-step generate in ~2s); the
reference publishes no numbers of its own (BASELINE.md), so that is the
stand-in denominator.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

A100_BASELINE_STEPS_PER_SEC = 10.0


def main() -> None:
    import os

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vision_ft_tpu.models.sdxl.config import DenoiserConfig
    from vision_ft_tpu.models.sdxl.denoiser import Denoiser

    on_tpu = jax.default_backend() not in ("cpu",)
    config = DenoiserConfig()
    denoiser = Denoiser(config)

    if on_tpu:
        batch, h, w = 2, 128, 128  # CFG pair at 1024px
    else:  # CPU smoke fallback so the script never hard-fails
        batch, h, w = 2, 32, 32

    # zeros-init: matmul timing is value-independent and this avoids a
    # 60s random-init pass over 2.6B params
    abstract = jax.eval_shape(lambda k: denoiser.init(k, jnp.bfloat16), jax.random.PRNGKey(0))
    params = jax.tree.map(lambda a: jnp.zeros(a.shape, a.dtype), abstract)
    latents = jax.random.normal(jax.random.PRNGKey(1), (batch, h, w, 4), jnp.bfloat16)
    timestep = jnp.full((batch,), 500.0, jnp.float32)
    context = jax.random.normal(
        jax.random.PRNGKey(2), (batch, 77, config.context_dim), jnp.bfloat16
    )
    pooled = jax.random.normal(jax.random.PRNGKey(3), (batch, 1280), jnp.bfloat16)
    size = jnp.full((batch, 2), float(h * 8), jnp.float32)
    crop = jnp.zeros((batch, 2), jnp.float32)

    # chain the steps on device (lax.fori_loop), mirroring the pipeline's
    # scanned denoise loop (models/sdxl/pipeline.py _denoise_loop): one
    # dispatch per generate, so the measurement is device throughput, not
    # per-call RPC latency
    chain = 10 if on_tpu else 2

    def run_chain(p, x, t, c, pl):
        def body(_, x):
            y = denoiser(p, x, t, c, pl, size, size, crop)
            return y.astype(x.dtype)

        return jax.lax.fori_loop(0, chain, body, x)

    fn = jax.jit(run_chain)

    # warmup / compile
    fn(params, latents, timestep, context, pooled).block_until_ready()
    fn(params, latents, timestep, context, pooled).block_until_ready()

    n_iters = 3 if on_tpu else 1
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = fn(params, latents, timestep, context, pooled)
    out.block_until_ready()
    elapsed = time.perf_counter() - t0

    steps_per_sec = n_iters * chain / elapsed
    print(
        json.dumps(
            {
                "metric": "sdxl_unet_fwd_1024px_cfg_steps_per_sec",
                "value": round(steps_per_sec, 3),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_sec / A100_BASELINE_STEPS_PER_SEC, 3),
            }
        )
    )


def _backend_ready(timeout_s: float = 120.0) -> bool:
    """Probe backend init in a subprocess (a wedged axon tunnel HANGS
    jax.devices(), and a failed init is cached for the process life)."""
    import subprocess
    import sys

    try:
        return (
            subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=timeout_s,
                capture_output=True,
            ).returncode
            == 0
        )
    except subprocess.TimeoutExpired:
        return False


def _emit_failure(reason: str) -> None:
    print(
        json.dumps(
            {
                "metric": "sdxl_unet_fwd_1024px_cfg_steps_per_sec",
                "value": 0,
                "unit": "steps/s",
                "vs_baseline": 0,
                "error": f"{reason} (last known on-chip: 10.48 steps/s, "
                "BASELINE.md)",
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    import os
    import signal
    import sys

    # Guarantee ONE JSON line even if the tunnel wedges mid-compile or
    # mid-run: the round-2 capture died rc=124 (driver timeout) with no
    # record at all because the probe loop alone could take 30 min. A
    # hard SIGALRM deadline converts any hang into an explicit failure
    # record before the driver's budget runs out.
    deadline = int(os.environ.get("BENCH_DEADLINE_S", "1200"))

    def _on_alarm(signum, frame):
        _emit_failure(f"bench exceeded {deadline}s deadline (wedged backend?)")
        os._exit(0)

    if deadline > 0:
        signal.signal(signal.SIGALRM, _on_alarm)
        signal.alarm(deadline)

    # The axon TPU tunnel can flap for minutes; don't lose the round's
    # number to a transient init failure — but keep the whole probe loop
    # well inside the deadline. BENCH_INIT_RETRIES=0 skips probing and
    # runs immediately (e.g. forced-CPU smoke runs).
    retries = int(os.environ.get("BENCH_INIT_RETRIES", "6"))
    ready = retries == 0
    for attempt in range(retries):
        if _backend_ready(timeout_s=60.0):
            ready = True
            break
        print(
            f"bench: backend not ready (attempt {attempt + 1}/{retries}); "
            "retrying in 20s",
            file=sys.stderr,
        )
        time.sleep(20)
    if not ready:
        # don't hang the driver on a dead tunnel — emit an explicit,
        # unambiguous failure record instead of a number
        _emit_failure(f"tpu backend unavailable after {retries} init retries")
        sys.exit(0)
    main()
