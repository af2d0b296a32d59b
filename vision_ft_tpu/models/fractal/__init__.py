from .generator import FractalMaskedTransformer, FractalMaskedTransformerOutput
from .mask import TruncatedNormalMaskGenerator, UniformMaskGenerator
from .order_sampler import sample_order
from .pixel import PixelTransformer, PixelTransformerOutput

__all__ = [
    "FractalMaskedTransformer",
    "FractalMaskedTransformerOutput",
    "UniformMaskGenerator",
    "TruncatedNormalMaskGenerator",
    "sample_order",
    "PixelTransformer",
    "PixelTransformerOutput",
]
