from . import factorized, fourier, losses, normalization, padding, resample

__all__ = [
    "factorized",
    "fourier",
    "losses",
    "normalization",
    "padding",
    "resample",
]
