"""Device mesh + distributed primitives.

The TPU-native replacement for the reference's Accelerate/NCCL DDP layer
(/root/reference/src/trainer/common.py:60-72,121,198,215 and
src/models/for_training.py:180): instead of wrapping modules in DDP and
calling collectives imperatively, we lay out a ``jax.sharding.Mesh`` and
annotate shardings; XLA inserts the all-reduces over ICI.

Axes:
  - ``data``  — batch-dim sharding (the reference's only parallelism).
  - ``fsdp``  — optional ZeRO-3-style param sharding (SURVEY.md §2.10:
    "pjit param sharding gives ZeRO-3-like behavior nearly for free").
  - ``tensor``— optional tensor parallelism for the attention/mlp matmuls.

Exactly the primitives the trainer consumes (§2.11): ``is_main_process``,
``barrier``, ``mean_gather``, ``shard_batch``, sharded param placement.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass
class MeshConfig:
    """Logical mesh sizes; -1 means "all remaining devices"."""

    data: int = -1
    fsdp: int = 1
    tensor: int = 1
    # GPipe pipeline stages (parallel/pipeline.py + a family's
    # set_pipeline); batch and params replicate over this axis by default
    # (param STORAGE stays fsdp-sharded — each pipe device assembles only
    # its stage slice at use via the pipeline's sharding constraint)
    pipe: int = 1

    def resolve(self, n_devices: Optional[int] = None) -> tuple[int, int, int, int]:
        n = n_devices if n_devices is not None else jax.device_count()
        d, f, t, p = self.data, self.fsdp, self.tensor, self.pipe
        known = max(1, f) * max(1, t) * max(1, p)
        if d == -1:
            assert n % known == 0, (
                f"{n} devices not divisible by fsdp*tensor*pipe={known}"
            )
            d = n // known
        assert d * f * t * p == n, f"mesh {d}x{f}x{t}x{p} != {n} devices"
        return d, f, t, p


def make_mesh(
    config: MeshConfig | None = None, devices: Optional[list] = None
) -> Mesh:
    config = config or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    d, f, t, p = config.resolve(len(devices))
    # ICI-friendly ordering: tensor innermost (highest bandwidth need),
    # data outermost (only grad all-reduce rides it); pipe sits between
    # data and fsdp — its ppermute is one activation per tick, the
    # lightest traffic of the four axes.
    arr = np.array(devices).reshape(d, p, f, t)
    return Mesh(arr, ("data", "pipe", "fsdp", "tensor"))


# -- shardings ---------------------------------------------------------------


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim split across data axis; rest replicated."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _fsdp_spec(shape: tuple[int, ...], fsdp_size: int, taken: Optional[int] = None) -> P:
    """Shard the largest divisible axis over 'fsdp'; replicate otherwise.
    ``taken`` marks an axis already claimed by the tensor dimension."""
    if fsdp_size <= 1 or not shape:
        return P()
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for axis in order:
        if axis == taken:
            continue
        if shape[axis] % fsdp_size == 0 and shape[axis] >= fsdp_size * 2:
            spec = [None] * len(shape)
            spec[axis] = "fsdp"
            return P(*spec)
    return P()


# Megatron-style tensor-parallel split by leaf name (torch Linear layout
# (out_features, in_features)): column-parallel projections shard
# out_features, row-parallel output projections shard in_features so the
# contraction carries the partial sums and XLA inserts the psum.
_TP_COLUMN = (
    "to_q", "to_k", "to_v", "q_proj", "k_proj", "v_proj", "q", "k", "v",
    "fc1", "proj", "w1q", "w1k", "w1v", "w2q", "w2k", "w2v", "gate_up_proj",
    "lora_down",
)
_TP_ROW = (
    "to_out", "out_proj", "o_proj", "o", "fc2", "w1o", "w2o", "down_proj",
    "lora_up",
)


def _tp_axis(path: tuple[str, ...], shape: tuple[int, ...], tp_size: int):
    """The param axis carried by the 'tensor' mesh axis, or None."""
    if tp_size <= 1 or len(shape) != 2:
        return None
    names = [p for p in path if not p.isdigit()]
    if not names or names[-1] != "weight" or len(names) < 2:
        return None
    owner = names[-2]
    if owner in _TP_COLUMN and shape[0] % tp_size == 0:
        return 0
    if owner in _TP_ROW and shape[1] % tp_size == 0:
        return 1
    return None


def param_shardings(mesh: Mesh, params: Any) -> Any:
    """NamedSharding pytree for params.

    - mesh tensor axis >1: Megatron-style column/row split of attention
      and MLP projection weights (by leaf name), everything else follows
      the fsdp rule.
    - mesh fsdp axis >1: ZeRO-3-style largest-divisible-axis sharding.
    - otherwise fully replicated (reference DDP semantics).
    """
    fsdp_size = mesh.shape.get("fsdp", 1)
    tp_size = mesh.shape.get("tensor", 1)

    def one(path, x) -> NamedSharding:
        shape = tuple(getattr(x, "shape", ()))
        key_path = tuple(
            getattr(k, "key", getattr(k, "name", str(getattr(k, "idx", k))))
            for k in path
        )
        tp_axis = _tp_axis(tuple(str(k) for k in key_path), shape, tp_size)
        base = _fsdp_spec(shape, fsdp_size, taken=tp_axis)
        if tp_axis is None:
            return NamedSharding(mesh, base)
        spec = list(base) + [None] * (len(shape) - len(base))
        spec[tp_axis] = "tensor"
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map_with_path(one, params)


def shard_params(mesh: Mesh, params: Any) -> Any:
    """Place a param pytree on the mesh with :func:`param_shardings`."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, s), params, param_shardings(mesh, params)
    )


def shard_batch(mesh: Mesh, batch: Any, grad_accum: bool = False) -> Any:
    """Place host batch arrays with the batch dim split over 'data'.

    With ``grad_accum=True`` leaves carry a leading (accum, micro_batch, ...)
    axis (see training.train_step) and the data shard rides dim 1.
    """

    def one(x):
        x = jnp.asarray(x) if not isinstance(x, jax.Array) else x
        if x.ndim == 0 or (grad_accum and x.ndim == 1):
            return jax.device_put(x, replicated(mesh))
        spec = P(None, "data") if grad_accum else P("data")
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(one, batch)


def get_abstract_state(fn, *args) -> Any:
    """jax.eval_shape passthrough (meta-device analogue for init planning)."""
    return jax.eval_shape(fn, *args)


# -- process-level primitives -----------------------------------------------


def is_main_process() -> bool:
    return jax.process_index() == 0


def barrier(name: str = "barrier") -> None:
    """Cross-host sync (reference accelerator.wait_for_everyone)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def mean_gather(value: jax.Array | float) -> float:
    """Mean of a per-host scalar across hosts (reference
    for_training.py:180 accelerator.gather().mean())."""
    if jax.process_count() == 1:
        return float(value)
    from jax.experimental import multihost_utils

    arr = multihost_utils.process_allgather(jnp.asarray(value, jnp.float32))
    return float(jnp.mean(arr))
