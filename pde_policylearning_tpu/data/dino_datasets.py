"""DINo datasets: on-the-fly Wave / Navier-Stokes trajectory generation +
observation masks.

reference: libs/DINo/data_pdes.py:54-290 (shelve-cached on-the-fly Wave and
NavierStokes datasets with GaussianRF initial conditions),
libs/DINo/utils.py:173-197 (irregular-grid masks).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .synthetic import gaussian_rf_2d, ns_vorticity_rollout


@partial(jax.jit, static_argnames=("n_steps", "record_every"))
def wave_rollout(u0, v0, speed: float, dt: float, n_steps: int,
                 record_every: int = 1):
    """2-D periodic wave equation u_tt = c^2 Lap(u), pseudo-spectral with
    leapfrog time stepping (data_pdes.py Wave dataset semantics)."""
    B, N, _ = u0.shape
    k = jnp.fft.fftfreq(N, d=1.0 / N) * 2 * jnp.pi
    lap = -(k[:, None] ** 2 + k[None, :] ** 2)

    def accel(u):
        u_h = jnp.fft.fft2(u, axes=(-2, -1))
        return jnp.real(jnp.fft.ifft2(speed ** 2 * lap * u_h, axes=(-2, -1)))

    def step(carry, _):
        u, v = carry
        v = v + dt * accel(u)
        u = u + dt * v
        return (u, v), None

    def record_block(carry, _):
        carry, _ = jax.lax.scan(step, carry, None, length=record_every)
        return carry, carry[0]

    n_records = n_steps // record_every
    _, frames = jax.lax.scan(record_block, (u0, v0), None, length=n_records)
    return jnp.moveaxis(frames, 0, -1)  # (B, N, N, n_records)


def generate_wave_data(key, n_traj: int, size: int, nt: int,
                       speed: float = 0.5, t_total: float = 1.0,
                       substeps: int = 8):
    """(n_traj, nt, size, size, 1) wave trajectories from GRF ICs."""
    u0 = gaussian_rf_2d(key, size, n_traj, alpha=3.0, tau=5.0)
    v0 = jnp.zeros_like(u0)
    dt = t_total / ((nt - 1) * substeps)
    frames = wave_rollout(u0, v0, speed, dt, n_steps=(nt - 1) * substeps,
                          record_every=substeps)
    traj = jnp.concatenate([u0[..., None], frames], axis=-1)
    return jnp.moveaxis(traj, -1, 1)[..., None]  # (B, T, N, N, 1)


def generate_navier_stokes_data(key, n_traj: int, size: int, nt: int,
                                visc: float = 1e-3, t_total: float = 1.0,
                                substeps: int = 16, forcing=None):
    """(n_traj, nt, size, size, 1) NS vorticity trajectories
    (data_pdes.py:211-290)."""
    if forcing is None:
        xs = np.linspace(0, 1, size, endpoint=False)
        X, Y = np.meshgrid(xs, xs, indexing="ij")
        forcing = jnp.asarray(
            0.1 * (np.sin(2 * np.pi * (X + Y)) + np.cos(2 * np.pi * (X + Y))))
    w0 = gaussian_rf_2d(key, size, n_traj)
    dt = t_total / ((nt - 1) * substeps)
    frames = ns_vorticity_rollout(w0, forcing, visc, dt,
                                  n_steps=(nt - 1) * substeps,
                                  record_every=substeps)
    traj = jnp.concatenate([w0[..., None], frames], axis=-1)
    return jnp.moveaxis(traj, -1, 1)[..., None]


def generate_mask(key, h_size: int, w_size: int, mask_data: float = 0.0):
    """Random observation mask: keep (1 - mask_data) of grid points
    (DINo/utils.py:191-197)."""
    if mask_data <= 0:
        return jnp.ones((h_size, w_size), bool)
    keep = jax.random.uniform(key, (h_size, w_size)) >= mask_data
    return keep


def generate_skipped_lat_lon_mask(h_size: int, w_size: int,
                                  base_jump: int = 0):
    """Regular lat-lon subsampling mask (DINo/utils.py:173-189): skip more
    aggressively near the poles (rows)."""
    mask = np.zeros((h_size, w_size), bool)
    for i in range(h_size):
        # distance to nearest pole normalized to [0, 1]
        d = min(i, h_size - 1 - i) / (h_size / 2)
        jump = 2 ** (base_jump + int(np.ceil(2 * (1 - d))))
        mask[i, ::jump] = True
    return jnp.asarray(mask)
