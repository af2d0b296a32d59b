"""Capture a jax.profiler trace of the SDXL UNet CFG forward (bench.py's
workload) and print the per-op device-time breakdown via xplane_stats.

Usage: python tools/bench/unet_profile.py [--iters 5] [--out /tmp/unet_trace]
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp


def main() -> None:
    iters = 5
    out = "/tmp/unet_trace"
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--iters":
            iters = int(argv[i + 1])
        elif a == "--out":
            out = argv[i + 1]

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".jax_cache",
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vision_ft_tpu.models.sdxl.config import DenoiserConfig
    from vision_ft_tpu.models.sdxl.denoiser import Denoiser

    config = DenoiserConfig()
    denoiser = Denoiser(config)
    batch, h, w = 2, 128, 128

    abstract = jax.eval_shape(lambda k: denoiser.init(k, jnp.bfloat16), jax.random.PRNGKey(0))
    params = jax.tree.map(lambda a: jnp.zeros(a.shape, a.dtype), abstract)
    latents = jax.random.normal(jax.random.PRNGKey(1), (batch, h, w, 4), jnp.bfloat16)
    timestep = jnp.full((batch,), 500.0, jnp.float32)
    context = jax.random.normal(jax.random.PRNGKey(2), (batch, 77, config.context_dim), jnp.bfloat16)
    pooled = jax.random.normal(jax.random.PRNGKey(3), (batch, 1280), jnp.bfloat16)
    size = jnp.full((batch, 2), float(h * 8), jnp.float32)
    crop = jnp.zeros((batch, 2), jnp.float32)

    fn = jax.jit(lambda p, x, t, c, pl: denoiser(p, x, t, c, pl, size, size, crop))
    fn(params, latents, timestep, context, pooled).block_until_ready()

    with jax.profiler.trace(out):
        for _ in range(iters):
            o = fn(params, latents, timestep, context, pooled)
        o.block_until_ready()

    from tools.bench.xplane_stats import collect, find_xplane

    path = find_xplane(out)
    rows = collect(path)
    per_op = {op: row[0] for op, row in rows.items()}
    per_op_count = {op: row[1] for op, row in rows.items()}
    total = sum(per_op.values())
    print(f"\ntotal device op time over {iters} iters: {total:.2f} ms "
          f"({total / iters:.2f} ms/step)")
    from collections import defaultdict

    from tools.bench.xplane_stats import categorize

    by_cat: dict[str, float] = defaultdict(float)
    for op, ms in per_op.items():
        by_cat[categorize(op)] += ms
    for cat, ms in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:<22} {ms / iters:8.2f} ms/step  {100 * ms / total:5.1f}%")
    print("\ntop 40 ops (per step):")
    for op, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {ms / iters:8.3f} ms  x{per_op_count[op] // iters:<4} {op[:110]}")


if __name__ == "__main__":
    main()
