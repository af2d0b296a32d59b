"""GPipe-style pipeline parallelism over a mesh axis.

The reference has no pipeline parallelism (its largest training recipe is
single-GPU + bitsandbytes, /root/reference/src/trainer/common.py); this is
a beyond-parity scaling leg for the uniform-depth transformer families
(Lumina2 NextDiT, AuraFlow/Flux MMDiT, CogView4) whose bf16 params exceed
one chip (6.8B-12B).

TPU-native design: no schedulers or send/recv queues — the whole schedule
is one ``lax.scan`` inside a ``shard_map`` over the ``pipe`` mesh axis,
with ``lax.ppermute`` rotating activations stage-to-stage over ICI. Each
device holds depth/P contiguous layers (params sharded on their stacked
leading axis); microbatch m reaches stage s at tick m+s, so a tick runs
every stage concurrently on different microbatches (the classic GPipe
diagonal; M + P - 1 ticks total, bubble fraction (P-1)/(M+P-1)).
Backward needs no separate machinery: ``jax.grad`` of scan+ppermute IS
the reverse schedule (ppermute transposes to the reverse rotation).

On a mesh that also carries a data axis, the intra-microbatch batch dim
shards over it (the pipe and data axes compose instead of replicating
work); batch-independent static aux enters as a separate replicated
argument and never rides the ppermute rotation.

Works under jit on any backend the mesh spans; differentiable end to end.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
try:
    from jax import shard_map as _shard_map  # jax >= 0.8

    def shard_map(f, *, mesh, in_specs, out_specs, check_rep):
        return _shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=check_rep,
        )
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec

_NO_STATIC = object()  # sentinel: stage_fn takes (params, x), no static arg


def stack_pipeline_stages(layer_params: list, num_stages: int):
    """Stack a list of per-layer param trees (depth L, uniform structure)
    into a single tree with leading axes (num_stages, L // num_stages, ...)
    — the layout ``pipeline_apply`` shards over the pipe axis."""
    depth = len(layer_params)
    assert depth % num_stages == 0, (depth, num_stages)
    per = depth // num_stages
    stacked = jax.tree.map(lambda *ls: jnp.stack(ls), *layer_params)
    return jax.tree.map(
        lambda a: a.reshape((num_stages, per) + a.shape[1:]), stacked
    )


def shard_pipeline_params(mesh: Mesh, stage_params, axis: str = "pipe"):
    """Place stage-stacked params (leading axis = pipe size) so each pipe
    device holds only its own stages' layers."""
    spec = NamedSharding(mesh, PartitionSpec(axis))
    return jax.tree.map(lambda a: jax.device_put(a, spec), stage_params)


def run_pipelined_stack(
    layer_fn: Callable[[Any, Any, Any], Any],
    layer_params: list,
    batched,
    static,
    mesh: Mesh,
    num_microbatches: int,
    axis: str = "pipe",
    wrap: Callable | None = None,
    batch_axis: str = "data",
):
    """Run a uniform layer stack through the GPipe schedule.

    - ``layer_fn(lp, batched, static) -> batched``: one layer. ``batched``
      is a pytree of (B, ...) arrays (activations + per-sample conditioning,
      e.g. adaLN vectors — return unchanged leaves as-is); ``static`` is
      batch-independent aux (rope tables), passed to every layer call
      as-is (replicated; it does not rotate around the pipe ring).
    - ``wrap``: optional transform for the per-layer call (e.g.
      ``nn.core.remat_layer`` for gradient checkpointing).

    Splits the batch into ``num_microbatches``, pipelines over
    ``mesh[axis]``, shards the per-microbatch batch dim over
    ``batch_axis`` when the mesh has one, and returns the ``batched``
    pytree re-assembled to full batch.
    """
    num_stages = mesh.shape[axis]
    stages = stack_pipeline_stages(layer_params, num_stages)
    stages = jax.tree.map(
        lambda a: jax.lax.with_sharding_constraint(
            a, NamedSharding(mesh, PartitionSpec(axis))
        ),
        stages,
    )
    b = jax.tree.leaves(batched)[0].shape[0]
    assert b % num_microbatches == 0, (
        f"batch {b} not divisible by pipeline_microbatches {num_microbatches}"
    )
    mb = b // num_microbatches
    dshard = mesh.shape.get(batch_axis, 1)
    if dshard > 1:
        assert mb % dshard == 0, (
            f"microbatch size {mb} (batch {b} / {num_microbatches} "
            f"microbatches) not divisible by the {batch_axis} axis ({dshard})"
        )

    def mb_split(a):
        return a.reshape((num_microbatches, mb) + a.shape[1:])

    def stage_fn(stage_params, x, st):
        def body(carry, lp):
            fn = lambda lp, c: layer_fn(lp, c, st)
            if wrap is not None:
                fn = wrap(fn)
            return fn(lp, carry), None

        carry, _ = jax.lax.scan(body, x, stage_params)
        return carry

    out = pipeline_apply(
        stage_fn, stages, jax.tree.map(mb_split, batched), mesh,
        axis=axis, static=static, batch_axis=batch_axis,
    )
    return jax.tree.map(lambda a: a.reshape((b,) + a.shape[2:]), out)


def pipeline_apply(
    stage_fn: Callable[..., Any],
    stage_params,
    microbatches,
    mesh: Mesh,
    axis: str = "pipe",
    static: Any = _NO_STATIC,
    batch_axis: str = "data",
):
    """Run ``microbatches`` through ``num_stages`` pipeline stages.

    - ``stage_fn(params_stage, x)`` — or ``stage_fn(params_stage, x,
      static)`` when ``static`` is given — applies ONE stage's layers
      (params have leading axis L/P — typically a ``lax.scan`` over them).
      ``x`` may be any pytree (activations + per-microbatch conditioning,
      passed through unchanged); the output must have the same structure
      and shapes. ``static`` is batch-independent aux handed to every
      stage call without entering the ring rotation.
    - ``stage_params``: pytree with leading axis P = mesh.shape[axis]
      (see ``stack_pipeline_stages``).
    - ``microbatches``: pytree with leading axis M (microbatch count).
      When the mesh has ``batch_axis``, every leaf's second dim (the
      per-microbatch batch) shards over it — pipe x data compose.

    Returns the pytree of outputs with leading axis M. Differentiable in
    ``stage_params``, ``microbatches`` and ``static``.
    """
    num_stages = mesh.shape[axis]
    leaves = jax.tree.leaves(microbatches)
    assert leaves, "empty microbatch pytree"
    num_mb = leaves[0].shape[0]
    assert all(l.shape[0] == num_mb for l in leaves), "ragged microbatch axis"
    ticks = num_mb + num_stages - 1
    has_static = static is not _NO_STATIC

    rep = PartitionSpec()  # replicated over every mesh axis
    mb_spec = (
        PartitionSpec(None, batch_axis)
        if mesh.shape.get(batch_axis, 1) > 1
        else rep
    )

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(PartitionSpec(axis), mb_spec, rep),
        out_specs=mb_spec,
        check_rep=False,
    )
    def run(params, xs, st):
        # local stage slice: leading pipe axis is 1 on-device
        params = jax.tree.map(lambda a: a[0], params)
        stage = jax.lax.axis_index(axis)
        perm = [(i, (i + 1) % num_stages) for i in range(num_stages)]

        def apply_stage(inp):
            return stage_fn(params, inp, st) if has_static else stage_fn(params, inp)

        def tick(carry, t):
            state, outs = carry
            # stage 0 consumes microbatch t (clamped reads past the end
            # are masked out by the output update below)
            idx = jnp.clip(t, 0, num_mb - 1)
            inject = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(a, idx, keepdims=False), xs
            )
            inp = jax.tree.map(
                lambda i, s: jnp.where(stage == 0, i, s), inject, state
            )
            out = apply_stage(inp)
            # the LAST stage finishes microbatch t - (P-1) at this tick
            mb = t - (num_stages - 1)
            mb_c = jnp.clip(mb, 0, num_mb - 1)

            def upd(acc, o):
                cur = jax.lax.dynamic_index_in_dim(acc, mb_c, keepdims=False)
                return jax.lax.dynamic_update_index_in_dim(
                    acc, jnp.where(mb >= 0, o, cur), mb_c, 0
                )

            outs = jax.tree.map(upd, outs, out)
            state = jax.tree.map(
                lambda o: jax.lax.ppermute(o, axis, perm), out
            )
            return (state, outs), None

        zeros_state = jax.tree.map(lambda a: jnp.zeros_like(a[0]), xs)
        outs0 = jax.tree.map(jnp.zeros_like, xs)
        (_, outs), _ = jax.lax.scan(
            tick, (zeros_state, outs0), jnp.arange(ticks)
        )
        # outputs are only correct on the last stage; broadcast over the
        # ring (everyone else contributes zeros)
        return jax.tree.map(
            lambda o: jax.lax.psum(
                jnp.where(stage == num_stages - 1, o, jnp.zeros_like(o)), axis
            ),
            outs,
        )

    if not has_static:
        static = None  # placeholder arg; never read by apply_stage
    return run(stage_params, microbatches, static)
