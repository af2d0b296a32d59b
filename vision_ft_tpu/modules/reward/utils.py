"""Reward model protocol (reference src/modules/reward/utils.py)."""

from __future__ import annotations

from abc import ABC, abstractmethod

import jax
from pydantic import BaseModel


class RewardModelMixin(ABC):
    """A reward model scores (images, prompts).

    Two surfaces:
    - ``__call__(images, prompts)``: host API on PIL images, mirrors the
      reference (utils.py:8-16); returns per-image scores/probs.
    - ``score(images, prompt_ids)``: jit-differentiable path on in-graph
      NHWC [-1,1] image tensors — this is what a working DRaFT+ loss
      needs (the reference's trainer stops at a TODO before using
      rewards, train/sdxl/draft_plus.py:235).
    """

    @abstractmethod
    def __call__(self, images, prompts) -> jax.Array:
        ...

    def score(self, images: jax.Array, prompt_ids) -> jax.Array:
        raise NotImplementedError(
            f"{type(self).__name__} does not support the differentiable path"
        )


class RewardModelConfig(BaseModel, ABC):
    type: str

    @abstractmethod
    def load_model(self, device=None) -> RewardModelMixin:
        ...
