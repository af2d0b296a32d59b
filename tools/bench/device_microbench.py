"""Microbenchmark ops by DEVICE time (xplane trace), not wall clock.

Through the axon tunnel, host wall-clock timing of small dispatches is
meaningless (RPC batching hides device time). This runs a callable under
jax.profiler.trace and reports the summed 'XLA Ops' device time per
iteration — the same accounting bench.py's per-op numbers come from.

Usage as a library:
    from tools.bench.device_microbench import device_time_ms
    ms = device_time_ms(lambda: f(a, b), iters=20)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import jax


def device_time_ms(run_once, iters: int = 10) -> float:
    """Total device op time per iteration (ms) for run_once()."""
    from tools.bench.xplane_stats import collect, find_xplane

    out = run_once()
    jax.block_until_ready(out)
    tmp = tempfile.mkdtemp(prefix="dmb_")
    try:
        with jax.profiler.trace(tmp):
            for _ in range(iters):
                out = run_once()
            jax.block_until_ready(out)
        per_op = collect(find_xplane(tmp))
        return sum(row[0] for row in per_op.values()) / iters
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    print("matmul device times:")
    for m, k, n in [
        (8192, 8192, 8192),
        (2048, 1280, 1280),
        (2048, 1280, 10240),
        (8192, 640, 640),
        (32768, 320, 320),
        (2048, 5120, 1280),
    ]:
        a = jax.random.normal(key, (m, k), jnp.bfloat16)
        b = jax.random.normal(key, (k, n), jnp.bfloat16)
        f = jax.jit(lambda a, b: a @ b)
        t = device_time_ms(lambda: f(a, b)) / 1e3  # s
        print(f"  {m}x{k}x{n}: {t * 1e3:7.3f} ms  {2 * m * k * n / t / 1e12:6.1f} TF/s")

    print("elementwise add bandwidth:")
    for sh in [(8192, 8192), (2048, 1280), (2, 1024, 1280)]:
        a = jax.random.normal(key, sh, jnp.bfloat16)
        b = jax.random.normal(key, sh, jnp.bfloat16)
        f = jax.jit(lambda a, b: a + b)
        t = device_time_ms(lambda: f(a, b)) / 1e3
        moved = a.size * 2 * 3
        print(f"  {sh}: {t * 1e6:7.1f} us  {moved / t / 1e9:6.0f} GB/s")


if __name__ == "__main__":
    main()
