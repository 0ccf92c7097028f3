"""Synthetic PDE data generation: Gaussian random fields + pseudo-spectral
2-D Navier-Stokes (vorticity form) solver.

reference: libs/DINo/data_pdes.py:161 (GaussianRF), :211-290 (pseudo-spectral
Crank-Nicolson NS solver used by both the DINo datasets and — upstream of
this repo — the Kolmogorov-flow .npy datasets consumed by
libs/pino_utils/datasets.py (KFDataset:448).

TPU-first: the solver advances under `lax.scan` with static shapes; a batch
of trajectories is generated with `vmap` in one compiled program.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("size", "batch", "alpha", "tau", "sigma"))
def gaussian_rf_2d(key, size: int, batch: int = 1, alpha: float = 2.5,
                   tau: float = 7.0, sigma: Optional[float] = None):
    """Sample periodic Gaussian random fields with covariance
    sigma^2 (-Lap + tau^2)^(-alpha) (data_pdes.py:161-209)."""
    if sigma is None:
        sigma = tau ** (0.5 * (2 * alpha - 2.0))
    k = jnp.fft.fftfreq(size, d=1.0 / size)
    k2 = k[:, None] ** 2 + k[None, :] ** 2
    # NB the size**2 factor: the eigenvalue scale is size**dim (GaussianRF
    # dim=2, data_pdes.py:176) so that backward-norm ifft2's 1/size**2
    # cancels and sample amplitude is resolution-independent.  (A round-2
    # `size * sqrt(2)` transcription made ICs ~1/size of the intended
    # amplitude: every KF trajectory collapsed onto the same forced
    # response and the IC rel-loss denominator ||u0|| was ~0.)
    sqrt_eig = (size ** 2 * math.sqrt(2.0) * sigma
                * ((4 * math.pi ** 2 * k2 + tau ** 2) ** (-alpha / 2.0)))
    sqrt_eig = sqrt_eig.at[0, 0].set(0.0)
    kr, ki = jax.random.split(key)
    # torch.randn(dtype=cfloat) draws each component at variance 1/2 (unit
    # total complex variance); match it so sample power agrees
    noise = (jax.random.normal(kr, (batch, size, size))
             + 1j * jax.random.normal(ki, (batch, size, size))) \
        * (1.0 / math.sqrt(2.0))
    u = jnp.fft.ifft2(sqrt_eig[None] * noise, axes=(1, 2))
    return jnp.real(u)


@partial(jax.jit, static_argnames=("n_steps", "record_every", "deriv_scale"))
def ns_vorticity_rollout(w0, forcing, visc: float, dt: float,
                         n_steps: int, record_every: int = 1,
                         deriv_scale: float = 1.0):
    """Pseudo-spectral 2-D NS in vorticity form, Crank-Nicolson diffusion +
    explicit nonlinear term (data_pdes.py:211-290 semantics).

    deriv_scale fixes the domain convention CONSISTENTLY for advection and
    diffusion: d/dx = (deriv_scale * i k), Laplacian = -(deriv_scale k)^2.
    1.0 -> [0, 2pi)^2 (the Kolmogorov-flow / PINO-loss convention,
    pino_utils/losses.py:71-107); 2*pi -> [0, 1)^2 (the DINo solver,
    data_pdes.py:233 `lap = 4 pi^2 (kx^2+ky^2)` with 2 pi k derivatives).

    w0: (B, N, N) initial vorticity; forcing: (N, N) or None-like zeros.
    Returns (B, N, N, n_records): records every `record_every` steps, NOT
    including w0.
    """
    B, N, _ = w0.shape
    k = jnp.fft.fftfreq(N, d=1.0 / N)
    k_x = deriv_scale * k[:, None]
    k_y = deriv_scale * k[None, :]
    lap = k_x ** 2 + k_y ** 2
    lap_safe = lap.at[0, 0].set(1.0)
    kcut = (2.0 / 3.0) * (N // 2) * deriv_scale
    dealias = ((jnp.abs(k_x) <= kcut)
               & (jnp.abs(k_y) <= kcut)).astype(w0.dtype)
    f_h = jnp.fft.fft2(forcing) if forcing is not None else 0.0

    def nonlinear(w_h):
        psi_h = w_h / lap_safe
        u = jnp.real(jnp.fft.ifft2(1j * k_y * psi_h, axes=(-2, -1)))
        v = jnp.real(jnp.fft.ifft2(-1j * k_x * psi_h, axes=(-2, -1)))
        wx = jnp.real(jnp.fft.ifft2(1j * k_x * w_h, axes=(-2, -1)))
        wy = jnp.real(jnp.fft.ifft2(1j * k_y * w_h, axes=(-2, -1)))
        adv = u * wx + v * wy
        return dealias * jnp.fft.fft2(adv, axes=(-2, -1))

    def step(w_h, _):
        nl = nonlinear(w_h)
        # Crank-Nicolson for viscosity, explicit advection + forcing
        num = ((1.0 - 0.5 * dt * visc * lap) * w_h
               - dt * nl + dt * f_h)
        den = 1.0 + 0.5 * dt * visc * lap
        return num / den, None

    def record_block(w_h, _):
        w_h, _ = jax.lax.scan(step, w_h, None, length=record_every)
        return w_h, jnp.real(jnp.fft.ifft2(w_h, axes=(-2, -1)))

    w_h0 = jnp.fft.fft2(w0, axes=(-2, -1))
    n_records = n_steps // record_every
    _, frames = jax.lax.scan(record_block, w_h0, None, length=n_records)
    return jnp.moveaxis(frames, 0, -1)  # (B, N, N, n_records)


def generate_kolmogorov_data(key, n_traj: int, size: int, nt: int,
                             visc: float = 1.0 / 40, t_interval: float = 1.0,
                             substeps: int = 32):
    """Generate Kolmogorov-flow vorticity trajectories with the canonical
    forcing -4 cos(4y) (pino_utils/losses.py:288) shaped like KFDataset
    samples: (n_traj, size, size, nt) with frame 0 = the GRF initial
    condition."""
    y = np.linspace(0, 2 * np.pi, size, endpoint=False).reshape(1, size)
    forcing = jnp.asarray(np.broadcast_to(-4 * np.cos(4 * y), (size, size)))
    w0 = gaussian_rf_2d(key, size, n_traj)
    dt = t_interval / ((nt - 1) * substeps)
    frames = ns_vorticity_rollout(w0, forcing, visc, dt,
                                  n_steps=(nt - 1) * substeps,
                                  record_every=substeps)
    return jax.jit(lambda w0, fr: jnp.concatenate([w0[..., None], fr],
                                                  axis=-1))(w0, frames)
