"""CPU<->device offloading for param trees.

Behavioral spec: /root/reference/src/modules/offload.py — a layer-group
index table where entering group i moves the previous group off-device and
the current group on-device (:56-89), plus whole-submodule `do_offloading`
moves inside generate() (e.g. sdxl/pipeline.py:322-413).

TPU-native form: params are pytrees, so "moving a module" is
``jax.device_put`` on a subtree. Layer groups are lists of param-path
prefixes. On TPU HBM (v5e 16GB) whole-model offload is rarely needed —
the reference uses the layerwise strategy only for CogView4 — but the
config surface is kept (SURVEY.md §2.10).
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Optional, Sequence

import jax

from ..nn.core import Params, flatten_params, unflatten_params


def _device(kind: str):
    if kind == "cpu":
        return jax.devices("cpu")[0]
    return jax.devices()[0]


def move_params(params: Params, device) -> Params:
    """device_put every leaf (the analogue of module.to(device))."""
    if isinstance(device, str):
        device = _device(device)
    return jax.tree.map(lambda x: jax.device_put(x, device), params)


def move_subtrees(params: Params, prefixes: Sequence[str], device) -> Params:
    """device_put only leaves whose flattened key starts with a prefix."""
    if isinstance(device, str):
        device = _device(device)
    flat = dict(flatten_params(params))
    for key in flat:
        if any(key.startswith(p) for p in prefixes):
            flat[key] = jax.device_put(flat[key], device)
    return unflatten_params(flat)


class LayerwiseOfflodStrategy:  # reference typo preserved (offload.py:15)
    """Group-by-group streaming: at each group head, the previous group
    moves to the offload device and the current group to execution."""

    def __init__(
        self,
        layer_groups: Sequence[Sequence[str]],
        execution_device="tpu",
        offload_device="cpu",
    ):
        self.layer_groups = [list(g) for g in layer_groups]
        self.execution_device = (
            _device(execution_device) if isinstance(execution_device, str) else execution_device
        )
        self.offload_device = (
            _device(offload_device) if isinstance(offload_device, str) else offload_device
        )

    def group_index_of(self, key: str) -> Optional[int]:
        for i, group in enumerate(self.layer_groups):
            if any(key.startswith(p) for p in group):
                return i
        return None

    def offload_all(self, params: Params) -> Params:
        flat = dict(flatten_params(params))
        for key in flat:
            if self.group_index_of(key) is not None:
                flat[key] = jax.device_put(flat[key], self.offload_device)
        return unflatten_params(flat)

    def maybe_offload_by_group(self, params: Params, group_idx: int) -> Params:
        """Bring group ``group_idx`` on-device, previous group off-device
        (reference offload.py:56-89)."""
        flat = dict(flatten_params(params))
        current = self.layer_groups[group_idx]
        previous = self.layer_groups[group_idx - 1] if group_idx > 0 else []
        for key in flat:
            if any(key.startswith(p) for p in current):
                flat[key] = jax.device_put(flat[key], self.execution_device)
            elif any(key.startswith(p) for p in previous):
                flat[key] = jax.device_put(flat[key], self.offload_device)
        return unflatten_params(flat)


class OffloadableModuleMixin:
    """Pipeline-level helper mirroring the reference mixin (offload.py:92):
    hold a strategy, expose on_device / maybe_offload_by_group over the
    owning object's ``params`` attribute."""

    offload_strategy: Optional[LayerwiseOfflodStrategy] = None

    def set_offload_strategy(self, strategy: Optional[LayerwiseOfflodStrategy]) -> None:
        self.offload_strategy = strategy

    def maybe_offload_by_group(self, params: Params, group_idx: int) -> Params:
        if self.offload_strategy is None:
            return params
        return self.offload_strategy.maybe_offload_by_group(params, group_idx)

    @contextmanager
    def on_device(self, params: Params, device="tpu"):
        """Temporarily place params on a device, restoring to offload
        device afterwards."""
        placed = move_params(params, device)
        try:
            yield placed
        finally:
            if self.offload_strategy is not None:
                move_params(placed, self.offload_strategy.offload_device)


@contextmanager
def stage_on_device(params: Params, key: str, enabled: bool,
                    execution="tpu", offload="cpu"):
    """Whole-submodule generate()-stage offload (reference
    sdxl/pipeline.py:322-413): bring ``params[key]`` to the execution
    device for the stage's duration, then park it on the offload device.
    No-op when ``enabled`` is False — the zero-cost default path."""
    if not enabled:
        yield
        return
    params[key] = move_params(params[key], execution)
    try:
        yield
    finally:
        params[key] = move_params(params[key], offload)
