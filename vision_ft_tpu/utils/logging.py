"""Tracker wiring (reference src/utils/logging.py): wandb / tensorboard
chosen by TrackerConfig.loggers; debug mode disables tracking. Trackers
are optional — missing packages degrade to a no-op with a warning."""

from __future__ import annotations

import warnings
from typing import Any, Optional


class Trackers:
    """Thin multiplexer with accelerate-tracker-like .log(dict, step)."""

    def __init__(self, loggers: list[str], project_name: str, config: dict):
        self._backends: list[tuple[str, Any]] = []
        for name in loggers:
            if name == "wandb":
                try:
                    import wandb

                    run = wandb.init(project=project_name, config=config)
                    self._backends.append(("wandb", run))
                except Exception as e:  # missing package / offline
                    warnings.warn(f"wandb tracker unavailable: {e}")
            elif name == "tensorboard":
                try:
                    from torch.utils.tensorboard import SummaryWriter

                    writer = SummaryWriter(log_dir=f"runs/{project_name}")
                    self._backends.append(("tensorboard", writer))
                except Exception as e:
                    warnings.warn(f"tensorboard tracker unavailable: {e}")
            else:
                raise ValueError(f"Unknown logger: {name}")

    def log(self, values: dict, step: Optional[int] = None) -> None:
        for kind, backend in self._backends:
            if kind == "wandb":
                backend.log(values, step=step)
            else:
                for key, value in values.items():
                    if isinstance(value, (int, float)):
                        backend.add_scalar(key, value, global_step=step)

    def finish(self) -> None:
        for kind, backend in self._backends:
            if kind == "wandb":
                backend.finish()
            else:
                backend.close()


def get_trackers(config) -> list[str]:
    if config.trainer.debug_mode is not False:
        return []
    if config.tracker is not None:
        return config.tracker.loggers
    return []


def wandb_image(image, caption: Optional[str] = None):
    import wandb

    return wandb.Image(image, caption=caption)
