"""Trace-time attention flop accounting for floor calculations.

XLA's ``cost_analysis()`` reports ZERO flops for Pallas custom-calls, so
a lowered step's "flops" both (a) misses the flash kernels entirely when
the trace takes the TPU path, and (b) — when traced on CPU, as
tools/bench/flop_floor.py does — counts the fallback XLA einsum
attention at the generic matmul roofline with plain-remat recompute
structure, neither of which matches what actually runs on the chip.

This counter records every attention dispatch's (b, h, sq, sk, d)
during tracing so the floor tool can subtract the XLA-path counted
flops and add the kernel's real cost at its OWN measured ceiling
(~77 TF/s at d=64: QK^T and PV each fill min(d,128) of the 128 MXU
lanes; r2 microbench).
"""

from __future__ import annotations

from typing import Optional

_STACK: list[dict] = []


class count_attention_flops:
    """Context manager; yields a dict accumulating per-dispatch stats.

    fwd_flops   — 4*b*h*sq*sk*d summed over dispatches (the two fwd dots)
    fwd_seconds — fwd_flops at the lane-scaled kernel ceiling
    calls       — dispatch count
    """

    def __enter__(self):
        self.stats = {"fwd_flops": 0.0, "fwd_seconds": 0.0, "calls": 0}
        _STACK.append(self.stats)
        return self.stats

    def __exit__(self, *exc):
        _STACK.pop()
        return False


def kernel_ceiling_tfs(d: int) -> float:
    """Measured flash-kernel dot ceiling by head_dim: 77 TF/s at d=64
    (r2, tools/bench/attn_kernel_bench.py) = 81% of the lane-scaled
    190 TF/s bf16 roofline; scale by the occupied lane fraction."""
    return 0.81 * 190.0 * min(d, 128) / 128.0


def add_attention_dispatch(b: int, h: int, sq: int, sk: int, d: int) -> None:
    """Record one attention call (forward). No-op outside the context."""
    if not _STACK:
        return
    flops = 4.0 * b * h * sq * sk * d
    stats = _STACK[-1]
    stats["fwd_flops"] += flops
    stats["fwd_seconds"] += flops / (kernel_ceiling_tfs(d) * 1e12)
    stats["calls"] += 1
