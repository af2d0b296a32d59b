"""PEFT: LoRA / LoHa as param-tree transformations.

Reference surface: /root/reference/src/modules/peft/ (configs, layer swap,
adapter collection, enable/disable, kohya/comfy key compat). TPU-native
delta (SURVEY.md §7): adapters are **extra param subtrees + functional
application**, not module swaps — ``replace_to_peft_layer`` returns a new
param pytree with ``lora_down``/``lora_up``/``alpha`` (or ``hada_*``)
subtrees inserted at the targeted layer paths, and ``nn.core.Linear`` /
``Conv2d`` apply them when present. Flattened keys match the reference
torch layouts exactly, so adapter safetensors are interchangeable.
"""

from typing import Literal, Optional, Union

from pydantic import BaseModel, field_validator

from ...utils.state_dict import RegexMatch
from .functional import (
    calculate_trainable_parameters,
    detect_peft_method,
    get_adapter_parameters,
    load_peft_weight,
    merge_params,
    print_trainable_parameters,
    replace_to_peft_layer,
    split_peft_params,
    while_peft_disabled,
    while_peft_enabled,
)

PEFT_TYPE = Literal["lora", "loha", "none"]


class PeftConfigMixin(BaseModel):
    type: PEFT_TYPE
    dtype: str = "bfloat16"


class LoRAConfig(PeftConfigMixin):
    type: Literal["lora"] = "lora"
    rank: int
    alpha: float = 1.0
    dropout: float = 0.0
    use_bias: bool = False


class LoHaConfig(PeftConfigMixin):
    type: Literal["loha"] = "loha"
    rank: int
    alpha: float = 1.0
    dropout: float = 0.0


PeftConfigUnion = Union[LoRAConfig, LoHaConfig]


class PeftTargetConfig(BaseModel):
    """Reference peft/__init__.py:24-48: include/exclude key targeting +
    adapter config + optional resume weights."""

    include_keys: list[Union[str, RegexMatch]] = []
    exclude_keys: list[Union[str, RegexMatch]] = []

    config: PeftConfigUnion

    resume_weight_path: Optional[str] = None
    resume_rename_key_map: dict[str, str] = {}

    @field_validator("include_keys")
    @classmethod
    def check_include_keys(cls, v):
        if len(v) == 0:
            raise ValueError("include_keys must not be empty")
        return v

    def replace_to_peft_layer(self, params, key, dtype=None):
        return replace_to_peft_layer(
            params,
            self.include_keys,
            self.exclude_keys,
            self.config,
            key,
            dtype=dtype,
        )


__all__ = [
    "PEFT_TYPE",
    "PeftConfigMixin",
    "LoRAConfig",
    "LoHaConfig",
    "PeftConfigUnion",
    "PeftTargetConfig",
    "RegexMatch",
    "replace_to_peft_layer",
    "get_adapter_parameters",
    "split_peft_params",
    "merge_params",
    "load_peft_weight",
    "detect_peft_method",
    "calculate_trainable_parameters",
    "print_trainable_parameters",
    "while_peft_disabled",
    "while_peft_enabled",
]
