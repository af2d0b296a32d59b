"""(reference src/modules/reward/functional.py)."""

from __future__ import annotations

from .utils import RewardModelConfig, RewardModelMixin


def load_reward_models(
    configs: list[RewardModelConfig], device=None
) -> list[RewardModelMixin]:
    return [config.load_model(device=device) for config in configs]
