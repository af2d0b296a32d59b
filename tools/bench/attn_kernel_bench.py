"""A/B device-time microbench: BHSD (transposing) vs BSHD (heads-packed)
flash attention on the SDXL bench shapes.

Times the full user-visible path: projections-shaped inputs (B, S, H*D),
any transposes, the kernel, output back in (B, S, H*D).

Usage: python tools/bench/attn_kernel_bench.py
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp

from tools.bench.device_microbench import device_time_ms


def train_mode() -> None:
    """fwd and fwd+bwd device time at the TRAIN bench shapes (batch 4) —
    the r3 sdxl_train_step profile shows the seq-4096 kernels at
    ~41 TF/s there vs this file's 77 TF/s forward-only number, so time
    the exact train contraction (value_and_grad through the kernel)."""
    from vision_ft_tpu.ops.pallas.flash_attention import flash_attention_bshd

    cases = [
        ("640ch 64^2 train (B=4, S=4096, H=10)", 4, 4096, 10, 64),
        ("1280ch 32^2 train (B=4, S=1024, H=20)", 4, 1024, 20, 64),
    ]
    for name, b, s, h, d in cases:
        inner = h * d
        q = jax.random.normal(jax.random.PRNGKey(0), (b, s, inner), jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(1), (b, s, inner), jnp.bfloat16)
        v = jax.random.normal(jax.random.PRNGKey(2), (b, s, inner), jnp.bfloat16)

        fwd = jax.jit(lambda q, k, v: flash_attention_bshd(q, k, v, h))

        def loss(q, k, v):
            return jnp.sum(flash_attention_bshd(q, k, v, h).astype(jnp.float32))

        grad = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
        fwd_flops = 4 * b * h * s * s * d  # QK^T + PV
        bwd_flops = 10 * b * h * s * s * d  # s, dp, dv, dk, dq recompute
        ms_f = device_time_ms(lambda: fwd(q, k, v), iters=20)
        ms_g = device_time_ms(lambda: grad(q, k, v), iters=20)
        ms_b = ms_g - ms_f  # grad runs fwd (delta needs o) + bwd kernels
        print(f"{name}:")
        print(f"  fwd      {ms_f:7.3f} ms  ({fwd_flops / ms_f / 1e9:6.1f} TF/s)")
        print(f"  fwd+bwd  {ms_g:7.3f} ms  (bwd ~{ms_b:.3f} ms, "
              f"{bwd_flops / max(ms_b, 1e-9) / 1e9:6.1f} TF/s)")


def main() -> None:
    from vision_ft_tpu.ops.pallas.flash_attention import (
        flash_attention_bshd,
        flash_attention_tpu,
    )

    if "--train" in sys.argv:
        train_mode()
        return

    cases = [
        ("640ch 64^2 (S=4096, H=10)", 2, 4096, 10, 64),
        ("1280ch 32^2 (S=1024, H=20)", 2, 1024, 20, 64),
    ]
    for name, b, s, h, d in cases:
        inner = h * d
        q = jax.random.normal(jax.random.PRNGKey(0), (b, s, inner), jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(1), (b, s, inner), jnp.bfloat16)
        v = jax.random.normal(jax.random.PRNGKey(2), (b, s, inner), jnp.bfloat16)

        def bhsd_path(q=q, k=k, v=v):
            def t(x):
                return x.reshape(b, s, h, d).transpose(0, 2, 1, 3)

            o = flash_attention_tpu(t(q), t(k), t(v))
            return o.transpose(0, 2, 1, 3).reshape(b, s, inner)

        def bshd_path(q=q, k=k, v=v):
            return flash_attention_bshd(q, k, v, h)

        f_bhsd = jax.jit(bhsd_path)
        f_bshd = jax.jit(bshd_path)
        err = jnp.abs(
            f_bhsd().astype(jnp.float32) - f_bshd().astype(jnp.float32)
        ).max()
        flops = 4 * b * h * s * s * d  # QK^T + PV
        ms_a = device_time_ms(f_bhsd, iters=20)
        ms_b = device_time_ms(f_bshd, iters=20)
        print(f"{name}: max|diff|={float(err):.3e}")
        print(f"  BHSD+transposes {ms_a:7.3f} ms  ({flops / ms_a / 1e9:6.1f} TF/s)")
        print(f"  BSHD packed     {ms_b:7.3f} ms  ({flops / ms_b / 1e9:6.1f} TF/s)")


if __name__ == "__main__":
    main()
