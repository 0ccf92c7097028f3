"""Physics-informed PDE residual losses (spectral finite differences).

reference: libs/pino_utils/losses.py (FDM_Darcy:6, darcy_loss:39,
FDM_NS_vorticity:71, FDM_Burgers:200, PINO_loss:223, PINO_loss3d:246,
get_forcing:288) and libs/envs/diff_control_env.py:5-60.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .losses import SimpleLpLoss


def fdm_darcy(u, a, D: float = 1.0):
    """Darcy flow residual -div(a grad u) via central differences
    (losses.py:6-37)."""
    b, size = u.shape[0], u.shape[1]
    u = u.reshape(b, size, size)
    a = a.reshape(b, size, size)
    dx = D / (size - 1)
    ux = (u[:, 2:, 1:-1] - u[:, :-2, 1:-1]) / (2 * dx)
    uy = (u[:, 1:-1, 2:] - u[:, 1:-1, :-2]) / (2 * dx)
    ai = a[:, 1:-1, 1:-1]
    aux = ai * ux
    auy = ai * uy
    auxx = (aux[:, 2:, 1:-1] - aux[:, :-2, 1:-1]) / (2 * dx)
    auyy = (auy[:, 1:-1, 2:] - auy[:, 1:-1, :-2]) / (2 * dx)
    return -(auxx + auyy)


def darcy_loss(u, a):
    Du = fdm_darcy(u, a)
    f = jnp.ones_like(Du)
    return SimpleLpLoss(size_average=True).rel(Du, f)


def fdm_ns_vorticity(w, v=1.0 / 40, t_interval: float = 1.0,
                     backend: str = "auto"):
    """2-D NS vorticity-form residual via streamfunction spectral derivatives
    + central time difference (losses.py:71-107).

    w: (B, N, N, T) vorticity trajectory -> residual (B, N, N, T-2).
    backend: 'auto' (DFT matmuls on TPU — XLA's TPU FFT is ~30x under the
    HBM roofline; NOTES_r2) | 'fft' | 'dft'.
    """
    import jax
    if backend == "dft" or (backend == "auto"
                            and jax.default_backend() == "tpu"):
        return _fdm_ns_vorticity_dft(w, v, t_interval)
    b, nx, ny, nt = w.shape
    w_h = jnp.fft.fft2(w, axes=(1, 2))
    k_max = nx // 2
    k = jnp.concatenate([jnp.arange(0, k_max), jnp.arange(-k_max, 0)])
    k_x = k.reshape(1, nx, 1, 1)
    k_y = k.reshape(1, 1, nx, 1)
    lap = (k_x ** 2 + k_y ** 2).astype(w_h.dtype)
    lap = lap.at[0, 0, 0, 0].set(1.0)
    f_h = w_h / lap

    def irfft2_trunc(a_h):
        return jnp.fft.irfft2(a_h[:, :, :k_max + 1], s=(nx, ny), axes=(1, 2))

    ux = irfft2_trunc(1j * k_y * f_h)
    uy = irfft2_trunc(-1j * k_x * f_h)
    wx = irfft2_trunc(1j * k_x * w_h)
    wy = irfft2_trunc(1j * k_y * w_h)
    wlap = irfft2_trunc(-lap * w_h)

    dt = t_interval / (nt - 1)
    wt = (w[..., 2:] - w[..., :-2]) / (2 * dt)
    v = jnp.asarray(v).reshape(-1, 1, 1, 1)
    return wt + (ux * wx + uy * wy - v * wlap)[..., 1:-1]


def _fdm_ns_vorticity_dft(w, v=1.0 / 40, t_interval: float = 1.0):
    """FFT-free twin of `fdm_ns_vorticity`: full-spectrum DFT matmuls with
    real-stacked (re, im) arithmetic — pure MXU work, and no complex
    matmuls anywhere (the TPU backend miscompiles batched complex ops
    under vmap; CLAUDE.md).  Exact to f32 (precision=HIGHEST on the
    transform contractions, same policy as truncated_dft_conv_nd)."""
    import jax
    b, nx, ny, nt = w.shape
    dt_ = w.dtype if w.dtype in (jnp.float32, jnp.float64) else jnp.float32
    w = w.astype(dt_)
    hp = jax.lax.Precision.HIGHEST
    import numpy as np_
    n = np_.arange(nx)
    k = np_.concatenate([np_.arange(0, nx // 2), np_.arange(-nx // 2, 0)])
    ang = -2.0 * np_.pi * np_.outer(k, n) / nx
    C = jnp.asarray(np_.cos(ang), dt_)          # forward F = C + iS
    S = jnp.asarray(np_.sin(ang), dt_)
    # full inverse along x: F^-1 = (C - i S)^T / N
    iC = jnp.asarray(np_.cos(ang).T / nx, dt_)
    iS = jnp.asarray(np_.sin(ang).T / nx, dt_)
    # half-spectrum irfft along y (the reference inverts with
    # irfft2(a_h[:, :, :k_max+1]), losses.py:94-97 — Nyquist semantics
    # included): out[n] = sum_f c_f (Re cos - Im sin)(2 pi f n / N) / N
    fy = np_.arange(nx // 2 + 1)
    cy = np_.full(nx // 2 + 1, 2.0)
    cy[0] = 1.0
    cy[-1] = 1.0
    angy = 2.0 * np_.pi * np_.outer(fy, np_.arange(ny)) / ny
    rCy = jnp.asarray(cy[:, None] * np_.cos(angy) / ny, dt_)  # (kh, y)
    rSy = jnp.asarray(cy[:, None] * np_.sin(angy) / ny, dt_)

    def fwd(re, im, axis_sym):
        # contract one spatial axis with F = C + iS
        eq = {"x": "bxyt,ux->buyt", "y": "bxyt,vy->bxvt"}[axis_sym]
        rC = jnp.einsum(eq, re, C, precision=hp)
        rS = jnp.einsum(eq, re, S, precision=hp)
        if im is None:
            return rC, rS
        iC_ = jnp.einsum(eq, im, C, precision=hp)
        iS_ = jnp.einsum(eq, im, S, precision=hp)
        return rC - iS_, rS + iC_

    kh = nx // 2 + 1

    def inv_real(re, im):
        # replicate irfft2(a[:, :, :k_max+1]): full complex inverse along
        # x, then the half-spectrum irfft along y
        rX = (jnp.einsum("buvt,ux->bxvt", re, iC, precision=hp)
              + jnp.einsum("buvt,ux->bxvt", im, iS, precision=hp))
        iX = (jnp.einsum("buvt,ux->bxvt", im, iC, precision=hp)
              - jnp.einsum("buvt,ux->bxvt", re, iS, precision=hp))
        return (jnp.einsum("bxvt,vy->bxyt", rX[:, :, :kh], rCy,
                           precision=hp)
                - jnp.einsum("bxvt,vy->bxyt", iX[:, :, :kh], rSy,
                             precision=hp))

    wr, wi = fwd(w, None, "x")
    wr, wi = fwd(wr, wi, "y")

    kx = jnp.asarray(k, dt_).reshape(1, nx, 1, 1)
    ky = jnp.asarray(k, dt_).reshape(1, 1, nx, 1)
    lap = kx ** 2 + ky ** 2
    lap_safe = lap.at[0, 0, 0, 0].set(1.0)
    fr, fi = wr / lap_safe, wi / lap_safe

    # multiply by i*a: (re, im) -> (-a*im, a*re)
    ux = inv_real(-ky * fi, ky * fr)
    uy = inv_real(kx * fi, -kx * fr)
    wx = inv_real(-kx * wi, kx * wr)
    wy = inv_real(-ky * wi, ky * wr)
    # NB lap_safe, not lap: the reference computes wlap with the
    # zero-mode-patched Laplacian (losses.py:84-92 sets lap[0,0,0,0]=1
    # BEFORE wlap_h = -lap*w_h), so the w mean leaks into wlap — replicated
    # for exact parity
    wlap = inv_real(-lap_safe * wr, -lap_safe * wi)

    dts = t_interval / (nt - 1)
    wt = (w[..., 2:] - w[..., :-2]) / (2 * dts)
    v = jnp.asarray(v, dt_).reshape(-1, 1, 1, 1)
    return wt + (ux * wx + uy * wy - v * wlap)[..., 1:-1]


def pino_loss_3d(u, u0, forcing, v=1.0 / 40, t_interval: float = 1.0):
    """(loss_ic, loss_f) for the Kolmogorov-flow vorticity trajectory
    (losses.py:246-262); identical math to Channelflow_PINO_loss
    (diff_control_env.py:44-60)."""
    lp = SimpleLpLoss(size_average=True)
    loss_ic = lp(u[..., 0], u0)
    Du = fdm_ns_vorticity(u, v, t_interval)
    f = jnp.broadcast_to(forcing, Du.shape)
    loss_f = lp(Du, f)
    return loss_ic, loss_f


channelflow_pino_loss = pino_loss_3d


def fdm_burgers(u, v, D: float = 1.0):
    """Burgers residual via spectral x-derivatives (losses.py:200-221).
    u: (B, T, N)."""
    b, nt, nx = u.shape
    dt = D / (nt - 1)
    u_h = jnp.fft.fft(u, axis=2)
    k_max = nx // 2
    k_x = jnp.concatenate([jnp.arange(0, k_max),
                           jnp.arange(-k_max, 0)]).reshape(1, 1, nx)
    ux_h = 2j * np.pi * k_x * u_h
    uxx_h = 2j * np.pi * k_x * ux_h
    ux = jnp.fft.irfft(ux_h[:, :, :k_max + 1], n=nx, axis=2)
    uxx = jnp.fft.irfft(uxx_h[:, :, :k_max + 1], n=nx, axis=2)
    ut = (u[:, 2:, :] - u[:, :-2, :]) / (2 * dt)
    return ut + (ux * u - v * uxx)[:, 1:-1, :]


def pino_loss_burgers(u, u0, v):
    """(loss_ic, loss_f) for Burgers (losses.py:223-243)."""
    boundary_u = u[:, 0, :]
    loss_u = jnp.mean((boundary_u - u0) ** 2)
    Du = fdm_burgers(u, v)
    loss_f = jnp.mean(Du ** 2)
    return loss_u, loss_f


def get_forcing(S: int):
    """Kolmogorov forcing -4 cos(4 y) on [0, 2pi)^2 (losses.py:288)."""
    x2 = jnp.linspace(0, 2 * np.pi, S, endpoint=False).reshape(1, S)
    x2 = jnp.broadcast_to(x2, (S, S))
    return (-4 * jnp.cos(4 * x2)).reshape(1, S, S, 1)
