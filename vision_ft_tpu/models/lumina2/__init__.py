from .config import DenoiserConfig, Lumina2Config
from .denoiser import Denoiser, NextDiT
from .pipeline import Lumina2
from .scheduler import Scheduler

__all__ = [
    "DenoiserConfig",
    "Lumina2Config",
    "Denoiser",
    "NextDiT",
    "Lumina2",
    "Scheduler",
]
