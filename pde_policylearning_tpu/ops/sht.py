"""Real spherical harmonic transforms (SHT) for spherical FNOs.

reference: the vendored neuralop's spherical convolution depends on
torch_harmonics.RealSHT / InverseRealSHT (neuralop/models/
spherical_convolution.py:4).  This is an independent JAX implementation:

  forward:  f(theta, phi) --rfft_phi--> f_m(theta) --Legendre--> f_{l,m}
  inverse:  f_{l,m} --Legendre--> f_m(theta) --irfft_phi--> f(theta, phi)

The associated Legendre matrices (orthonormal, Condon-Shortley-free) and
quadrature weights are precomputed in float64 numpy per (nlat, nlon, lmax,
grid) and cached; the transforms themselves are einsums on the MXU.

Grids: 'equiangular' (Driscoll-Healy weights) and 'legendre-gauss'.
"""
from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


def _legendre_assoc(lmax: int, mmax: int, x: np.ndarray) -> np.ndarray:
    """Orthonormalized associated Legendre P_l^m(x), shape (lmax, mmax,
    len(x)); normalization such that spherical harmonics are orthonormal
    on the sphere (4pi normalization absorbed)."""
    nlat = len(x)
    P = np.zeros((lmax, mmax, nlat))
    # P_0^0
    P[0, 0] = 1.0 / np.sqrt(4.0 * np.pi)
    sin_t = np.sqrt(np.clip(1.0 - x * x, 0.0, None))
    # diagonal recurrence P_m^m
    for m in range(1, mmax):
        P[m, m] = -np.sqrt((2 * m + 1) / (2.0 * m)) * sin_t * P[m - 1, m - 1]
    # P_{m+1}^m
    for m in range(mmax):
        if m + 1 < lmax:
            P[m + 1, m] = np.sqrt(2 * m + 3) * x * P[m, m]
    # upward recurrence in l
    for m in range(mmax):
        for l in range(m + 2, lmax):
            a = np.sqrt((4 * l * l - 1.0) / (l * l - m * m))
            b = np.sqrt(((l - 1.0) ** 2 - m * m) / (4.0 * (l - 1.0) ** 2
                                                    - 1.0))
            P[l, m] = a * (x * P[l - 1, m] - b * P[l - 2, m])
    return P


def _quadrature(nlat: int, grid: str):
    if grid == "legendre-gauss":
        x, w = np.polynomial.legendre.leggauss(nlat)
        # colatitude decreasing in cos -> sort descending like equiangular
        order = np.argsort(-x)
        return x[order], w[order]
    if grid == "equiangular":
        # Driscoll-Healy / Clenshaw-Curtis-type exact weights on
        # theta_j = pi (j + 0.5) / nlat
        theta = np.pi * (np.arange(nlat) + 0.5) / nlat
        x = np.cos(theta)
        w = np.zeros(nlat)
        ks = np.arange(nlat // 2)
        for j, t in enumerate(theta):
            # exact for Legendre polynomials up to degree ~nlat (verified:
            # sum w = 2, int P_k sin = 0 for k>=1)
            w[j] = (4.0 / nlat) * np.sin(t) * np.sum(
                np.sin((2 * ks + 1) * t) / (2 * ks + 1))
        return x, w
    raise ValueError(f"Unknown grid {grid!r}")


@lru_cache(maxsize=16)
def sht_matrices(nlat: int, nlon: int, lmax: int | None = None,
                 mmax: int | None = None, grid: str = "equiangular"):
    """Precompute (Pw, P) — analysis (with quadrature weights folded in)
    and synthesis Legendre matrices, shapes (lmax, mmax, nlat)."""
    lmax = lmax or nlat
    mmax = mmax or min(lmax, nlon // 2 + 1)
    x, w = _quadrature(nlat, grid)
    P = _legendre_assoc(lmax, mmax, x)
    Pw = P * w[None, None, :]
    # Return HOST numpy arrays: this function is lru_cached, and a
    # jnp.asarray created inside a jit trace is a tracer — caching it
    # leaks the tracer into later traces (observed UnexpectedTracerError
    # when the first call happens under jit).  Call sites convert.
    return Pw, P


def rsht(f: jnp.ndarray, lmax: int | None = None,
         mmax: int | None = None, grid: str = "equiangular") -> jnp.ndarray:
    """Real SHT.  f: (..., nlat, nlon, C) -> (..., lmax, mmax, C) complex."""
    nlat, nlon = f.shape[-3], f.shape[-2]
    Pw, _ = sht_matrices(nlat, nlon, lmax, mmax, grid)
    mmax_eff = Pw.shape[1]
    fm = jnp.fft.rfft(f, axis=-2)[..., :mmax_eff, :]  # (..., nlat, m, C)
    fm = fm * (2 * np.pi / nlon)
    return jnp.einsum("...tmc,lmt->...lmc", fm, Pw.astype(fm.real.dtype))


def irsht(flm: jnp.ndarray, nlat: int, nlon: int,
          grid: str = "equiangular") -> jnp.ndarray:
    """Inverse real SHT.  flm: (..., lmax, mmax, C) -> (..., nlat, nlon, C)."""
    lmax, mmax = flm.shape[-3], flm.shape[-2]
    _, P = sht_matrices(nlat, nlon, lmax, mmax, grid)
    fm = jnp.einsum("...lmc,lmt->...tmc", flm, P.astype(flm.real.dtype))
    # pad m axis to nlon//2+1 for irfft
    pad = nlon // 2 + 1 - mmax
    if pad > 0:
        cfg = [(0, 0)] * fm.ndim
        cfg[-2] = (0, pad)
        fm = jnp.pad(fm, cfg)
    # jnp.irfft includes 1/nlon; the real-field conjugate symmetry supplies
    # the 2*Re(...) doubling for m>0 automatically
    return jnp.fft.irfft(fm, n=nlon, axis=-2) * nlon
