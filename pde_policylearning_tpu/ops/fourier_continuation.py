"""Fourier continuation: Legendre-based periodic extension of non-periodic
signals.

reference: neuralop/models/fourier_continuation.py:7 (FCLegendre).  The
extension matrix is precomputed with numpy Legendre fits (cached per (n, d))
and applied as matmuls.
"""
from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np
from numpy.polynomial.legendre import Legendre


@lru_cache(maxsize=8)
def _extension_matrix(n: int, d: int) -> np.ndarray:
    """(d, 2n) matrix mapping [right n points, left n points] -> extension
    values that make the signal periodic (fourier_continuation.py:15-45)."""
    a, h = 0.0, 0.1
    total = 2 * n + d
    full_grid = a + h * np.arange(total, dtype=np.float64)
    fit_grid = np.concatenate([full_grid[:n], full_grid[-n:]])
    ext_grid = full_grid[n:-n]
    eye = np.eye(2 * n)
    X = np.zeros((2 * n, 2 * n))
    Q = np.zeros((d, 2 * n))
    for j in range(2 * n):
        poly = Legendre(eye[j], domain=[full_grid[0], full_grid[-1]])
        X[:, j] = poly(fit_grid)
        Q[:, j] = poly(ext_grid)
    return Q @ np.linalg.pinv(X, rcond=1e-31)


class FCLegendre:
    """Extend the last one/two axes of a field to make it periodic."""

    def __init__(self, n: int, d: int, dtype=jnp.float32):
        self.n = n
        self.d = d
        self.ext_mat = jnp.asarray(_extension_matrix(n, d), dtype)

    def extend_left_right(self, x):
        y = jnp.concatenate([x[..., -self.n:], x[..., :self.n]], axis=-1)
        ext = y @ self.ext_mat.T.astype(x.dtype)
        return jnp.concatenate([x, ext], axis=-1)

    def extend_top_bottom(self, x):
        y = jnp.concatenate([x[..., -self.n:, :], x[..., :self.n, :]],
                            axis=-2)
        ext = jnp.einsum("dm,...mk->...dk", self.ext_mat.astype(x.dtype), y)
        return jnp.concatenate([x, ext], axis=-2)

    def extend2d(self, x):
        return self.extend_top_bottom(self.extend_left_right(x))

    def __call__(self, x):
        return self.extend2d(x)
