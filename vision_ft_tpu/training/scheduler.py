"""LR-schedule factory.

The reference resolves schedules through transformers ``get_scheduler``
names first, then dotted torch classes, with a no-op fallback
(/root/reference/src/scheduler/util.py:9-64, nothing.py:4). Here the same
names map to optax schedule callables (step -> lr multiplier x base lr).
"""

from __future__ import annotations

from typing import Callable, Optional

import optax


def get_schedule(
    name: Optional[str],
    base_lr: float,
    num_training_steps: int = 0,
    num_warmup_steps: int = 0,
    args: Optional[dict] = None,
) -> Callable:
    """Return an optax schedule fn. ``name=None`` -> constant (the
    reference's NothingScheduler)."""
    args = args or {}
    num_warmup_steps = int(args.get("num_warmup_steps", num_warmup_steps))
    num_training_steps = int(args.get("num_training_steps", num_training_steps))
    if name is None or name in ("nothing", "constant"):
        return optax.constant_schedule(base_lr)

    if name == "constant_with_warmup":
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, base_lr, max(num_warmup_steps, 1)),
                optax.constant_schedule(base_lr),
            ],
            [num_warmup_steps],
        )
    if name == "linear":
        decay = max(num_training_steps - num_warmup_steps, 1)
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, base_lr, max(num_warmup_steps, 1)),
                optax.linear_schedule(base_lr, 0.0, decay),
            ],
            [num_warmup_steps],
        )
    if name == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0,
            base_lr,
            max(num_warmup_steps, 1),
            max(num_training_steps, num_warmup_steps + 1),
        )
    if name == "cosine_with_restarts":
        cycles = int(args.get("num_cycles", 1))
        per = max((num_training_steps - num_warmup_steps) // max(cycles, 1), 1)
        scheds = [optax.linear_schedule(0.0, base_lr, max(num_warmup_steps, 1))]
        bounds = [num_warmup_steps]
        for i in range(cycles):
            scheds.append(optax.cosine_decay_schedule(base_lr, per))
            if i < cycles - 1:
                bounds.append(num_warmup_steps + per * (i + 1))
        return optax.join_schedules(scheds, bounds)
    if name == "polynomial":
        power = float(args.get("power", 1.0))
        lr_end = float(args.get("lr_end", 1e-7))
        decay = max(num_training_steps - num_warmup_steps, 1)
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, base_lr, max(num_warmup_steps, 1)),
                optax.polynomial_schedule(base_lr, lr_end, power, decay),
            ],
            [num_warmup_steps],
        )
    if name == "inverse_sqrt":
        import jax.numpy as jnp

        warm = max(num_warmup_steps, 1)
        return lambda step: base_lr * jnp.minimum(
            (step + 1) / warm, jnp.sqrt(warm / jnp.maximum(step + 1, 1))
        )
    raise ValueError(f"Unknown scheduler: {name!r}")
