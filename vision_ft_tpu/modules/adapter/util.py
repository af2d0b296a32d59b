"""Adapter framework.

Reference: /root/reference/src/modules/adapter/util.py — an Adapter swaps
a targeted module (regex on the module path); an AdapterManager owns the
injected layers' weights under mangled keys for checkpoint I/O.

TPU-native form: the module swap is *static* (the adapter model class
builds its denoiser with an adapter attention class), and the manager is a
pure key-mapping layer between the live param tree (adapter weights live
inline at ``...attn2.to_k_ip.weight``) and the reference's on-disk layout
(``ip_adapter.{odd_index}.to_k_ip.weight``) — the "!"-mangling the torch
ModuleDict needs does not exist here; only the dot-form appears on disk
(reference get_state_dict, ip_adapter/__init__.py:195-203).
"""

from __future__ import annotations

from abc import ABC
from typing import Sequence

from pydantic import BaseModel

from ...nn.core import Params, flatten_params, unflatten_params
from ...utils.state_dict import RegexMatch


class Adapter(ABC):
    """Marker base for adapter attention modules."""

    target_key: RegexMatch
    # param leaf subtree names owned by the adapter (e.g. to_k_ip, to_v_ip)
    adapter_param_names: Sequence[str] = ()


class AdapterManager:
    """Maps adapter params between live tree paths and on-disk keys.

    ``target_paths``: the targeted module paths in *replacement order*
    (the reference's named_children DFS order). Disk indices follow the
    reference's cross-attn-only odd indexing: adapter i -> key prefix
    ``ip_adapter.{2*i + 1}.`` (ip_adapter/__init__.py:107-121).
    """

    disk_prefix: str = "ip_adapter"

    def __init__(self, adapter_class: type[Adapter], adapter_config: BaseModel):
        self.adapter_class = adapter_class
        self.adapter_config = adapter_config
        self.target_paths: list[str] = []

    def set_target_paths(self, paths: Sequence[str]) -> None:
        self.target_paths = list(paths)

    def _disk_key(self, index: int, suffix: str) -> str:
        return f"{self.disk_prefix}.{index * 2 + 1}.{suffix}"

    def get_state_dict(self, params: Params) -> dict:
        """Live tree -> on-disk adapter state dict."""
        flat = flatten_params(params)
        out = {}
        for i, path in enumerate(self.target_paths):
            prefix = f"{path}."
            for key, value in flat.items():
                if key.startswith(prefix):
                    suffix = key[len(prefix):]
                    if suffix.split(".")[0] in self.adapter_class.adapter_param_names:
                        out[self._disk_key(i, suffix)] = value
        return out

    def load_state_dict(self, params: Params, state_dict: dict) -> Params:
        """On-disk adapter state dict -> merged live tree."""
        flat = dict(flatten_params(params))
        for i, path in enumerate(self.target_paths):
            prefix = f"{self.disk_prefix}.{i * 2 + 1}."
            for key, value in state_dict.items():
                if key.startswith(prefix):
                    flat[f"{path}.{key[len(prefix):]}"] = value
        return unflatten_params(flat)
