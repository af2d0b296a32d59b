"""Abstract per-workload model wrapper.

Behavioral spec: /root/reference/src/models/for_training.py — lifecycle
hooks (before/after_setup_model, sanity_check, train/eval/preview steps,
save hooks), buffered step/epoch logging with cross-host mean reduction.

TPU-native delta: the torch ``train_step(batch) -> loss`` (imperative,
autograd) becomes a **pure** ``loss_fn(trainable, frozen, batch, key)``
consumed by the jitted SPMD train step; host-side work (tokenization,
PIL) lives in ``preprocess_batch``. torch.compile hooks map to jax.jit
(always on), so ``after_setup_model`` has no compile step.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any, Optional

import jax
import numpy as np
from pydantic import BaseModel

from ..config import TrainConfig
from ..nn.core import Params
from ..parallel import mean_gather


class ModelForTraining(ABC):
    model_config: BaseModel
    model_config_class: type[BaseModel]

    model: Any  # the pipeline object (e.g. SDXLModel)

    def __init__(self, trainer: Any, config: TrainConfig) -> None:
        self.trainer = trainer
        self.config = config
        self._current_step = 0
        self._logs_at_step: dict = {}
        self._logs_at_epoch: dict[str, list] = {}
        self._is_peft = False
        self.validate_config()

    def validate_config(self) -> None:
        self.model_config = self.model_config_class.model_validate(self.config.model)

    def _set_is_peft(self, is_peft: bool) -> None:
        self._is_peft = is_peft

    # -- params ------------------------------------------------------------

    def get_params(self) -> Params:
        """Full param tree of the wrapped pipeline."""
        return self.model.params

    def set_params(self, params: Params) -> None:
        self.model.params = params

    def trainable_filter(self, path: str) -> bool:
        """Full-finetune split: which param paths train when no PEFT config
        is present. Default: the denoiser trains, text encoders/VAE are
        frozen (reference setup_model eval()s text_encoder/vae,
        train/sdxl/text_to_image.py:34-42)."""
        return path.startswith("denoiser.")

    def peft_extra_trainable_filter(self, path: str) -> bool:
        """Paths that stay FULLY trainable even under a PEFT config (e.g.
        the shortcut embedder, reference train/auraflow/shortcut.py:294-305
        asserts it trains alongside LoRA). Default: none."""
        return False

    def load_peft_weights(self) -> None:
        """Resume adapters (reference PeftTargetConfig.resume_weight_path)."""
        from ..modules.peft import load_peft_weight
        from ..utils import safetensors as st

        peft = self.config.peft
        targets = peft if isinstance(peft, list) else [peft] if peft else []
        for target in targets:
            if target.resume_weight_path is not None:
                state_dict = st.load_file_with_rename_key_map(
                    target.resume_weight_path, target.resume_rename_key_map
                )
                self.set_params(load_peft_weight(self.get_params(), state_dict))

    # -- lifecycle hooks ---------------------------------------------------

    @abstractmethod
    def before_setup_model(self) -> None:
        ...

    @abstractmethod
    def setup_model(self) -> None:
        ...

    def after_setup_model(self) -> None:
        pass

    @abstractmethod
    def sanity_check(self) -> None:
        ...

    # -- the functional training interface ---------------------------------

    def preprocess_batch(self, batch: dict) -> dict:
        """Host-side batch prep (tokenize captions, stack arrays). Runs
        outside jit; returns arrays ready for the device."""
        return batch

    @abstractmethod
    def loss_fn(
        self, trainable: Params, frozen: Params, batch: dict, key: jax.Array
    ) -> tuple[jax.Array, dict]:
        """PURE loss over (trainable, frozen) param split. The jit unit."""
        ...

    def eval_step(self, batch: dict):
        raise NotImplementedError

    # -- step/epoch hooks ---------------------------------------------------

    def before_train_step(self) -> None:
        self.increment_step()

    def after_train_step(self) -> None:
        self._send_logs_at_step()

    def before_eval_step(self) -> None:
        pass

    def after_eval_step(self) -> None:
        self._send_logs_at_step()

    def before_backward(self) -> None:
        pass

    def after_backward(self) -> None:
        # grad clipping lives in the optimizer chain (training/optimizer.py)
        pass

    def before_train_epoch(self) -> None:
        pass

    def after_train_epoch(self) -> None:
        self._send_logs_at_epoch()

    def before_eval_epoch(self) -> None:
        pass

    def after_eval_epoch(self) -> None:
        self._send_logs_at_epoch()

    # -- saving / preview hooks ---------------------------------------------

    def get_state_dict_to_save(self) -> dict[str, jax.Array]:
        return self.model.state_dict()

    def get_metadata_to_save(self) -> dict[str, str]:
        return {}

    def before_save_model(self) -> None:
        pass

    def after_save_model(self) -> None:
        pass

    def before_preview(self) -> None:
        pass

    def before_preview_step(self) -> None:
        pass

    @abstractmethod
    def preview_step(self, batch: dict, preview_index: int) -> Any:
        ...

    def after_preview_step(self) -> None:
        pass

    def after_preview(self) -> None:
        pass

    # -- logging -------------------------------------------------------------

    def print(self, *args, **kwargs) -> None:
        from ..parallel import is_main_process

        if is_main_process():
            print(*args, **kwargs)

    def log(self, name: str, value, on_step: bool = True, on_epoch: bool = False) -> None:
        if isinstance(value, (jax.Array, np.ndarray)):
            value = mean_gather(np.asarray(value).mean())
        if on_step:
            self._logs_at_step[name] = value
        if on_epoch:
            self._logs_at_epoch.setdefault(name, []).append(value)

    def _send_logs_at_step(self) -> None:
        self.trainer.log_dict(self._logs_at_step, step=self._current_step)
        self._logs_at_step = {}

    def _send_logs_at_epoch(self) -> None:
        for name, values in self._logs_at_epoch.items():
            if values and isinstance(values[0], (float, int)):
                self.trainer.log_dict(
                    {f"{name}_epoch": sum(values) / len(values)},
                    step=self._current_step,
                )
            else:
                for i, value in enumerate(values):
                    self.trainer.log_dict(
                        {f"{name}_{i}_epoch": value}, step=self._current_step
                    )
        self._logs_at_epoch = {}

    def increment_step(self) -> None:
        self._current_step += 1
