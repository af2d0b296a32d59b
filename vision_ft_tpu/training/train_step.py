"""SPMD train step builder.

Replaces the reference's imperative loop body — autocast fwd, accelerate
backward w/ DDP all-reduce, clip, opt.step, sched.step
(/root/reference/src/trainer/common.py:287-365) — with ONE jit-compiled
function over the device mesh. Gradient accumulation (the reference's
no_sync + loss/N pattern, common.py:301-313) becomes a ``lax.scan`` over a
leading microbatch axis, so the whole accumulation window is a single
XLA program with grads accumulated in-register/HBM and exactly one
cross-device reduce at the end (inserted automatically by SPMD
partitioning — the jax analogue of DDP's bucketed all-reduce).

Params are split into ``trainable`` / ``frozen`` subtrees (PEFT-ready:
LoRA params live in trainable while the base model stays frozen), and the
step is donated so param/optimizer buffers update in place.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Params = Any
# loss_fn(trainable, frozen, batch, key) -> (loss, metrics dict)
LossFn = Callable[[Params, Params, Any, jax.Array], tuple[jax.Array, dict]]


class TrainState(NamedTuple):
    trainable: Params
    opt_state: Any
    step: jax.Array


def init_train_state(
    optimizer: optax.GradientTransformation, trainable: Params
) -> TrainState:
    return TrainState(
        trainable=trainable,
        opt_state=optimizer.init(trainable),
        step=jnp.zeros([], jnp.int32),
    )


def make_train_step(
    loss_fn: LossFn,
    optimizer: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    grad_accum: int = 1,
    donate: bool = True,
):
    """Build the jitted train step.

    Returns ``step(state, frozen, batch, key) -> (state, metrics)``.

    With ``grad_accum > 1`` every batch leaf must carry a leading
    (grad_accum, micro_batch, ...) axis; the data-parallel shard rides the
    micro_batch dim. With ``grad_accum == 1`` leaves are (batch, ...).
    """

    batch_spec = (
        P(None, "data") if grad_accum > 1 else P("data")
    )

    def _constrain_batch(batch):
        if mesh is None:
            return batch

        def one(x):
            if x.ndim == 0:
                return x
            spec = batch_spec
            if grad_accum > 1 and x.ndim == 1:
                spec = P(None)
            return lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

        return jax.tree.map(one, batch)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def step(state: TrainState, frozen: Params, batch: Any, key: jax.Array):
        batch = _constrain_batch(batch)

        if grad_accum == 1:
            (loss, metrics), grads = grad_fn(state.trainable, frozen, batch, key)
        else:
            keys = jax.random.split(key, grad_accum)

            def body(carry, micro):
                grads_acc, loss_acc = carry
                mb, k = micro
                (l, _), g = grad_fn(state.trainable, frozen, mb, k)
                grads_acc = jax.tree.map(jnp.add, grads_acc, g)
                return (grads_acc, loss_acc + l), None

            zero_grads = jax.tree.map(
                lambda x: jnp.zeros(x.shape, jnp.float32), state.trainable
            )
            (grads, loss), _ = lax.scan(
                body, (zero_grads, jnp.zeros([], jnp.float32)), (batch, keys)
            )
            inv = 1.0 / grad_accum
            grads = jax.tree.map(lambda g: g * inv, grads)
            loss = loss * inv
            metrics = {}

        updates, opt_state = optimizer.update(grads, state.opt_state, state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        metrics = dict(metrics)
        metrics["train/loss"] = loss
        metrics["train/grad_norm"] = optax.global_norm(grads)
        return TrainState(trainable, opt_state, state.step + 1), metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(loss_fn: LossFn, mesh: Optional[Mesh] = None):
    def step(trainable: Params, frozen: Params, batch: Any, key: jax.Array):
        loss, metrics = loss_fn(trainable, frozen, batch, key)
        metrics = dict(metrics)
        metrics["eval/loss"] = loss
        return metrics

    return jax.jit(step)
