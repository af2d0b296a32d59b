"""Orbax full train-state checkpointing (SURVEY.md §5.3 extra).

The reference never checkpoints optimizer state — resume means reloading
adapter weights only. On TPU pods preemption is routine, so the Trainer
can periodically persist {trainable params, optax state, step} and
restore them on startup (``trainer.state_checkpoint_dir``)."""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_train_state(
    directory: str, step: int, trainable: Any, opt_state: Any,
    ema: Optional[Any] = None,
) -> str:
    """Write the state under <directory>/step_<N>; returns the path.
    Previous step dirs are kept (pruning is the operator's call)."""
    path = os.path.join(os.path.abspath(directory), f"step_{step}")
    state = {
        "step": step,
        "trainable": trainable,
        "opt_state": opt_state,
    }
    if ema is not None:
        state["ema"] = ema
    _checkpointer().save(path, state, force=True)
    return path


def latest_checkpoint_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        if name.startswith("step_"):
            try:
                steps.append(int(name.split("_", 1)[1]))
            except ValueError:
                continue
    return max(steps) if steps else None


def restore_train_state(
    directory: str, trainable_like: Any, opt_state_like: Any,
    ema_like: Optional[Any] = None,
) -> Optional[tuple[int, Any, Any] | tuple[int, Any, Any, Any]]:
    """Restore the newest step_<N> state; None if absent. The *_like
    arguments provide the pytree structure/shape/dtype targets. With
    ``ema_like`` a 4-tuple (step, trainable, opt_state, ema) is returned
    (ema falls back to the restored trainable for checkpoints written
    before EMA was enabled)."""
    step = latest_checkpoint_step(directory)
    if step is None:
        return None
    path = os.path.join(os.path.abspath(directory), f"step_{step}")
    target = {
        "step": step,
        "trainable": trainable_like,
        "opt_state": opt_state_like,
    }
    if ema_like is not None:
        try:
            restored = _checkpointer().restore(
                path, item={**target, "ema": ema_like}
            )
            ema = restored["ema"]
        except Exception as e:  # checkpoint predates EMA (or its ema
            # subtree is unreadable): seed from the trainable — loudly,
            # since this replaces the running average with the
            # instantaneous weights
            import logging

            logging.getLogger(__name__).warning(
                "restore_train_state: no restorable 'ema' subtree in %s "
                "(%s: %s) — seeding EMA from the restored trainable params",
                path, type(e).__name__, e,
            )
            restored = _checkpointer().restore(path, item=target)
            ema = restored["trainable"]
        return (
            int(restored["step"]), restored["trainable"],
            restored["opt_state"], ema,
        )
    restored = _checkpointer().restore(path, item=target)
    return int(restored["step"]), restored["trainable"], restored["opt_state"]
