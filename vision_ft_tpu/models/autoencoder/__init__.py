from .kl import AutoencoderKL, AutoencoderKLConfig, DiagonalGaussian

__all__ = ["AutoencoderKL", "AutoencoderKLConfig", "DiagonalGaussian"]
