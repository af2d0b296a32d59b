"""NF4 fused-matmul kernel microbench: fused Pallas vs XLA dequant.

VERDICT r4 #4: the fused kernel is the memory-enabling default but runs
24-31% slower than XLA dequant where both fit. This tool times the two
paths at the exact Linear shapes of the tracked configs (AuraFlow 6.8B
MMDiT, SDXL) so kernel levers (block geometry, LUT variants, M-step
dequant redundancy) can be A/B'd in isolation instead of through a
20-minute end-to-end run.

Usage: python tools/bench/nf4_kernel_bench.py [--m 4360] [--fwd-only]
           [--profile DIR] [--shapes auraflow|sdxl|all]

Env: VFT_NF4_BM / VFT_NF4_BN / VFT_NF4_BKH override the kernel's block
picks (read by ops/pallas/nf4_matmul._pick_blocks) for geometry sweeps.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp
import numpy as np

# (name, n=out_features, k=in_features) — the hot Linears
SHAPES = {
    "auraflow": [
        ("mmdit_qkvo", 3072, 3072),
        ("mmdit_ff_up", 8192, 3072),
        ("mmdit_ff_down", 3072, 8192),
    ],
    "sdxl": [
        ("attn_qkv_1280", 1280, 1280),
        ("ff_up_1280", 10240, 1280),
        ("ff_down_1280", 1280, 5120),
    ],
}


def main() -> None:
    cache = os.path.join(_REPO, ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    m, fams, fwd_only, profile_dir = 4360, ["auraflow"], False, None
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--m":
            m = int(argv[i + 1])
        elif a == "--shapes":
            fams = (
                list(SHAPES) if argv[i + 1] == "all" else [argv[i + 1]]
            )
        elif a == "--fwd-only":
            fwd_only = True
        elif a == "--profile":
            profile_dir = argv[i + 1]

    from vision_ft_tpu.modules.quant.functional import quantize_weight
    from vision_ft_tpu.modules.quant.nf4 import dequantize_4bit
    from vision_ft_tpu.ops.pallas.nf4_matmul import nf4_matmul, supports

    rng = np.random.default_rng(0)
    rows = []
    for fam in fams:
        for name, n, k in SHAPES[fam]:
            if not supports(m, k, n, 64):
                print(f"[nf4] skip {name}: unsupported", file=sys.stderr)
                continue
            w = rng.standard_normal((n, k), np.float32) * 0.02
            q = quantize_weight(w, "bnb_nf4")  # packed is already split-layout
            assert "split" in q, "expected split device layout"
            d_packed = jnp.asarray(q["packed"])
            d_absmax = jnp.asarray(np.asarray(q["absmax"], np.float32))
            d_code = jnp.asarray(np.asarray(q["code"], np.float32))
            x = jnp.asarray(
                rng.standard_normal((m, k), np.float32), jnp.bfloat16
            )

            def fused_fwd(x):
                return nf4_matmul(
                    x, d_packed, d_code, d_absmax, (n, k), split=True
                )

            def xla_fwd(x):
                wq = dequantize_4bit(
                    d_packed, d_code, d_absmax, (n, k), dtype=jnp.bfloat16,
                    split=True,
                )
                return x @ wq.T

            def stream_fwd(x):
                from vision_ft_tpu.ops.nf4_stream import nf4_stream_matmul

                return nf4_stream_matmul(
                    x, d_packed, d_code, d_absmax, (n, k)
                )

            def bench(fn, tag):
                f = jax.jit(fn)
                # warm with SCALAR FETCHES: through the axon tunnel
                # block_until_ready can early-ack while the compile is
                # still in flight, dumping it into the timed window
                for _ in range(2):
                    out = f(x)
                    float(jnp.sum(out[:1, :1].astype(jnp.float32)))
                iters = 20
                t0 = time.perf_counter()
                for _ in range(iters):
                    out = f(x)
                float(jnp.sum(out[:1, :1].astype(jnp.float32)))
                dt = (time.perf_counter() - t0) / iters
                if profile_dir:
                    with jax.profiler.trace(
                        os.path.join(profile_dir, f"{name}_{tag}")
                    ):
                        for _ in range(3):
                            out = f(x)
                        jax.block_until_ready(out)
                return dt * 1e3

            def bench_grad(fn, tag):
                if fwd_only:
                    return None
                g = jax.jit(jax.grad(lambda x: jnp.sum(fn(x).astype(jnp.float32))))
                for _ in range(2):
                    out = g(x)
                    float(jnp.sum(out[:1, :1].astype(jnp.float32)))
                iters = 10
                t0 = time.perf_counter()
                for _ in range(iters):
                    out = g(x)
                float(jnp.sum(out[:1, :1].astype(jnp.float32)))
                return (time.perf_counter() - t0) / iters * 1e3

            fused_ms = bench(fused_fwd, "fused")
            xla_ms = bench(xla_fwd, "xla")
            stream_ms = bench(stream_fwd, "stream")
            fused_g = bench_grad(fused_fwd, "fused")
            xla_g = bench_grad(xla_fwd, "xla")
            stream_g = bench_grad(stream_fwd, "stream")
            # matmul-bound floor: 2*m*n*k bf16 FLOPs at the measured
            # 190 TF/s practical ceiling (device_microbench)
            floor_ms = 2 * m * n * k / 190e12 * 1e3
            row = {
                "shape": f"{name} m{m} n{n} k{k}",
                "fused_fwd_ms": round(fused_ms, 3),
                "xla_fwd_ms": round(xla_ms, 3),
                "stream_fwd_ms": round(stream_ms, 3),
                "fwd_ratio": round(fused_ms / xla_ms, 3),
                "matmul_floor_ms": round(floor_ms, 3),
            }
            if fused_g is not None:
                row["fused_fwdbwd_ms"] = round(fused_g, 3)
                row["xla_fwdbwd_ms"] = round(xla_g, 3)
                row["stream_fwdbwd_ms"] = round(stream_g, 3)
            rows.append(row)
            print(f"[nf4] {row}", file=sys.stderr, flush=True)

    print(json.dumps({"metric": "nf4_kernel_bench", "rows": rows}))


if __name__ == "__main__":
    main()
