from . import (factorized, fourier, losses, normalization, padding,
               pde_losses, resample)

__all__ = [
    "factorized",
    "fourier",
    "losses",
    "normalization",
    "padding",
    "pde_losses",
    "resample",
]
