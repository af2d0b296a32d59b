from .optimizer import get_optimizer
from .scheduler import get_schedule
from .train_step import TrainState, make_train_step

__all__ = ["get_optimizer", "get_schedule", "TrainState", "make_train_step"]
