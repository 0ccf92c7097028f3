"""Turbulent channel-flow DNS core: staggered-grid RK3 + FFT-Poisson projection.

reference: libs/envs/control_env.py (compute_rhs_py:429, time_advance_RK3_py:533,
compute_projection_step:582, compute_pressure_py:196) and the MATLAB originals
in libs/matlab_codes/ (main.m grid/wavenumbers/DD construction:40-75).

TPU re-design decisions:
* All per-y-row Python loops in the reference become whole-array ops with
  precomputed metric arrays broadcast along y.
* The projection's Poisson solve — 1024 independent (Ny-1)x(Ny-1) dense
  solves in a Python double loop (control_env.py:593-602) — becomes ONE
  batched matmul against precomputed inverses `Pinv[(kx,kz)]`, using rfft
  along z so only Nz//2+1 columns are solved.  Optional iterative-refinement
  steps recover f64-grade residuals in f32 (TPU has no native f64).
* Everything is a pure function of (grid, state) pytrees -> jit/scan/vmap
  compose; the whole RK3 step (3x rhs + 3x projection + metrics) compiles
  into a single XLA executable with no host sync.

Staggered layout (y-axis):
  y  (Ny,)   wall-normal face coordinates in [0, 2]  (walls at 0 and 2)
  ym (Ny-1,) cell centers;  yg (Ny+1,) ghost-extended centers
  U, W: (Nx, Ny+1, Nz) at centers + 2 ghost rows;  V: (Nx, Ny, Nz) at faces.
x/z are periodic with uniform spacing dx = Lx/Nx, dz = Lz/Nz.
"""
from __future__ import annotations

import math
from functools import lru_cache, partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class ChannelGrid:
    """Static grid geometry + precomputed solver operators (pytree)."""
    y: jnp.ndarray      # (Ny,)
    ym: jnp.ndarray     # (Ny-1,)
    yg: jnp.ndarray     # (Ny+1,)
    kxx: jnp.ndarray    # (Nx,) modified wavenumbers -kx^2
    kzz: jnp.ndarray    # (Nz,)
    # Eigen-factorization of the wall-normal operator DD = A diag(lam) B
    # (A = S^-1 Q, B = Q^T S from the diagonal symmetrization) — the
    # per-wavenumber solve (DD + kk I)^-1 rhs becomes two SHARED dense
    # matmuls + an elementwise divide by (lam + kk), ~66 KB of operator
    # data instead of Nx*Nzr dense inverses (36 MB).
    eig_A: jnp.ndarray   # (Ny-1, Ny-1)
    eig_B: jnp.ndarray   # (Ny-1, Ny-1)
    eig_lam: jnp.ndarray  # (Ny-1,)
    # Regularized (0,0)-mode solve, diagonally equilibrated for f32: the
    # raw inverse-multiply suffers catastrophic cancellation because the
    # graded mesh gives the rhs ~1e5 dynamic range across y; solving
    # (S D S) q = S r with S = 1/sqrt(|diag|) keeps every intermediate
    # O(1).  p = S (Pinv00_eq @ (S r)).
    Pinv00_eq: jnp.ndarray  # (Ny-1, Ny-1)
    s00: jnp.ndarray        # (Ny-1,)
    DD_diag: jnp.ndarray  # (Ny-1,) tridiagonal Poisson operator (for refine)
    DD_lower: jnp.ndarray  # (Ny-2,)
    DD_upper: jnp.ndarray  # (Ny-2,)
    # Bordered (Schur) form of the eigen-solve for the fused TPU kernels:
    # n = Ny-1 = 129 rows pad every MXU contraction to 2 tiles of 128, so
    # the kernels solve the leading m = n-1 = 128 block in its own
    # eigenbasis (A1/B1/lam1: same diagonal symmetrization applied to
    # DD[:m,:m]) and recover the last row through the per-wavenumber Schur
    # scalar: with M11 = DD[:m,:m] + kk I,
    #   y       = M11^-1 t[:m]
    #   P_last  = (t[m] - DD[m,m-1] * y[m-1]) / schur_s(kk)
    #   P[:m]   = y - schur_g(kk) * P_last
    # where schur_g = DD[m-1,m] * M11^-1 e_{m-1}  (m, F) and
    # schur_s = DD[m,m] + kk - DD[m,m-1]*schur_g[m-1]  (1, F) are
    # precomputed per wavenumber column (F = Nx*(Nz//2+1), kxx-major kzz-
    # minor, matching rk3_pallas._solve_consts).  schur_s ~ 0 at the
    # Neumann (0,0) mode is guarded at construction; that column is
    # overridden by the regularized Pinv00_eq solve in-kernel anyway.
    eig_A1: jnp.ndarray    # (Ny-2, Ny-2)
    eig_B1: jnp.ndarray    # (Ny-2, Ny-2)
    eig_lam1: jnp.ndarray  # (Ny-2,)
    schur_g: jnp.ndarray   # (Ny-2, F)
    schur_s: jnp.ndarray   # (1, F)
    dx: float = struct.field(pytree_node=False)
    dz: float = struct.field(pytree_node=False)
    dt: float = struct.field(pytree_node=False)
    nu: float = struct.field(pytree_node=False)
    Nx: int = struct.field(pytree_node=False)
    Ny: int = struct.field(pytree_node=False)
    Nz: int = struct.field(pytree_node=False)
    refine_steps: int = struct.field(pytree_node=False, default=0)


@struct.dataclass
class ChannelState:
    U: jnp.ndarray      # (Nx, Ny+1, Nz)
    V: jnp.ndarray      # (Nx, Ny,   Nz)
    W: jnp.ndarray      # (Nx, Ny+1, Nz)
    dPdx: jnp.ndarray   # scalar, running reverse-calculated pressure gradient
    meanU0: jnp.ndarray  # scalar, target bulk velocity for mass-flow control


DEFAULT_NU = 1.0 / 3250.0          # main.m:11
DEFAULT_DPDX = 0.57231059e-1 ** 2  # main.m:12 (utau^2)


def make_channel_grid(Nx: int = 32, Ny: int = 130, Nz: int = 32,
                      Lx: float = 2 * math.pi, Lz: float = 2 * math.pi,
                      stretch: float = 2.6,
                      nu: float = DEFAULT_NU, dt: float = 1e-3,
                      y: Optional[np.ndarray] = None,
                      dtype=jnp.float32,
                      refine_steps: Optional[int] = None) -> ChannelGrid:
    """Build the grid + precomputed Poisson inverses.

    Default geometry follows the commented canonical construction in
    main.m:20-24: uniform periodic x/z, tanh-stretched y:
    ``y = 1 + tanh(s * linspace(-1,1,Ny)) / tanh(s)``.
    A `y` array may be passed instead (e.g. loaded from a checkpoint/.mat).
    """
    dx = Lx / Nx
    dz = Lz / Nz
    if y is None:
        y = 1.0 + np.tanh(stretch * np.linspace(-1, 1, Ny)) / np.tanh(stretch)
    y = np.asarray(y, np.float64).reshape(-1)
    Ny = len(y)
    ym = 0.5 * (y[:-1] + y[1:])
    yg = np.concatenate([[-ym[0]], ym, [2.0 + ym[0]]])

    # modified wavenumbers (main.m:43-57 / control_env.py:54-64)
    k = np.arange(Nx)
    k = np.where(k <= Nx // 2, k, k - Nx)
    kxx = 2.0 * (np.cos(2 * np.pi * k / Nx) - 1.0) / dx ** 2
    kz = np.arange(Nz)
    kz = np.where(kz <= Nz // 2, kz, kz - Nz)
    kzz = 2.0 * (np.cos(2 * np.pi * kz / Nz) - 1.0) / dz ** 2

    # wall-normal Poisson operator DD (main.m:60-72 / control_env.py:66-77)
    n = Ny - 1
    diag = np.zeros(n)
    for j in range(n):
        diag[j] = -1.0 / (y[j + 1] - y[j]) * (
            1.0 / (yg[j + 2] - yg[j + 1]) + 1.0 / (yg[j + 1] - yg[j]))
    lower = np.zeros(n - 1)
    upper = np.zeros(n - 1)
    for j in range(n - 1):
        lower[j] = 1.0 / (y[j + 2] - y[j + 1]) / (yg[j + 2] - yg[j + 1])
        upper[j] = 1.0 / (y[j + 1] - y[j]) / (yg[j + 2] - yg[j + 1])
    diag[0] += 1.0 / (y[1] - y[0]) / (yg[1] - yg[0])
    diag[-1] += 1.0 / (y[n] - y[n - 1]) / (yg[n + 1] - yg[n])
    DD = np.diag(diag) + np.diag(lower, -1) + np.diag(upper, 1)

    # Eigen-factorize DD once: DD is a nonsymmetric tridiagonal similar to
    # a symmetric one via a diagonal scaling S (off-diagonal products are
    # positive), so DD = S^-1 Q diag(lam) Q^T S with orthogonal Q.  Then
    # (DD + kk I)^-1 rhs = A [ (B rhs) / (lam + kk) ] with A = S^-1 Q,
    # B = Q^T S — two dense matmuls shared across ALL wavenumbers.
    # symmetry requires (s_{j}/s_{j-1})^2 = upper/lower
    s = np.ones(n)
    for j in range(1, n):
        s[j] = s[j - 1] * np.sqrt(upper[j - 1] / lower[j - 1])
    s /= np.exp(np.mean(np.log(np.abs(s))))  # scale-free normalization
    off_sym = np.sqrt(lower * upper)
    T = np.diag(diag) + np.diag(off_sym, -1) + np.diag(off_sym, 1)
    lam, Q = np.linalg.eigh(T)
    eig_A = Q / s[:, None]
    eig_B = Q.T * s[None, :]
    # the horizontally-averaged (0,0) mode uses the 1.5*D[0,0]
    # regularization (control_env.py:598-599): dedicated equilibrated
    # inverse (see ChannelGrid.Pinv00_eq)
    D00 = DD.copy()
    D00[0, 0] *= 1.5
    s00 = 1.0 / np.sqrt(np.abs(np.diag(D00)))
    Pinv00_eq = np.linalg.inv((s00[:, None] * D00) * s00[None, :])

    # bordered (Schur) factorization for the fused kernels (see
    # ChannelGrid field docs): eigen-factorize the leading m = n-1 block
    # and precompute the per-wavenumber Schur vectors in f64
    m = n - 1
    lam1, Q1 = np.linalg.eigh(T[:m, :m])
    eig_A1 = Q1 / s[:m, None]
    eig_B1 = Q1.T * s[None, :m]
    Nzr = Nz // 2 + 1
    kkF = (kxx[:, None] + kzz[None, :Nzr]).reshape(1, -1)     # (1, F)
    denom1 = lam1[:, None] + kkF                              # (m, F)
    schur_g = upper[m - 1] * (eig_A1 @ (eig_B1[:, m - 1:m] / denom1))
    schur_s = (diag[m] + kkF) - lower[m - 1] * schur_g[m - 1:m]
    # the full-operator Neumann null mode lives in the Schur scalar at
    # kk = 0 (column 0): guard it (that column is solved by Pinv00_eq)
    tiny = 1e-9 * np.max(np.abs(schur_s))
    schur_s = np.where(np.abs(schur_s) < tiny, 1.0, schur_s)

    if refine_steps is None:
        refine_steps = 0 if dtype == jnp.float64 else 1
    as_dt = lambda a: jnp.asarray(a, dtype)
    return ChannelGrid(
        y=as_dt(y), ym=as_dt(ym), yg=as_dt(yg),
        kxx=as_dt(kxx), kzz=as_dt(kzz),
        eig_A=as_dt(eig_A), eig_B=as_dt(eig_B), eig_lam=as_dt(lam),
        Pinv00_eq=as_dt(Pinv00_eq), s00=as_dt(s00),
        DD_diag=as_dt(diag), DD_lower=as_dt(lower), DD_upper=as_dt(upper),
        eig_A1=as_dt(eig_A1), eig_B1=as_dt(eig_B1), eig_lam1=as_dt(lam1),
        schur_g=as_dt(schur_g), schur_s=as_dt(schur_s),
        dx=float(dx), dz=float(dz), dt=float(dt), nu=float(nu),
        Nx=Nx, Ny=Ny, Nz=Nz, refine_steps=int(refine_steps),
    )


# ---------------------------------------------------------------------------
# helper rolls: periodic shifts along x (axis -3) and z (axis -1)
# ---------------------------------------------------------------------------

def _xm(a):  # a[i-1] in x
    return jnp.roll(a, 1, axis=-3)


def _xp(a):  # a[i+1] in x
    return jnp.roll(a, -1, axis=-3)


def _zm(a):
    return jnp.roll(a, 1, axis=-1)


def _zp(a):
    return jnp.roll(a, -1, axis=-1)


def _pad_y(a, before, after):
    return jnp.pad(a, ((0, 0), (before, after), (0, 0)))


def apply_boundary_condition(U, V, W, Vw1, Vw2):
    """No-slip walls via antisymmetric ghost rows for U/W; wall-normal
    actuation Vw1/Vw2 on the V wall faces (control_env.py:10-19)."""
    U = U.at[:, 0, :].set(-U[:, 1, :])
    U = U.at[:, -1, :].set(-U[:, -2, :])
    V = V.at[:, 0, :].set(Vw1)
    V = V.at[:, -1, :].set(Vw2)
    W = W.at[:, 0, :].set(-W[:, 1, :])
    W = W.at[:, -1, :].set(-W[:, -2, :])
    return U, V, W


def compute_rhs(grid: ChannelGrid, U, V, W, dPdx):
    """Momentum RHS (XLA path; the TPU rollout fast path lives in
    envs/rk3_pallas.py, which fuses whole substages.  A piecewise-fused
    RHS-only kernel variant was tried in round 2 and REGRESSED the closed
    loop ~9x — operand-layout copies around every pallas call; it was
    removed in round 4 per the one-alternate-path-per-op policy,
    NOTES_r4)."""
    return _compute_rhs_unfused(grid, U, V, W, dPdx)


def _compute_rhs_unfused(grid: ChannelGrid, U, V, W, dPdx):
    """Momentum RHS Fu, Fv, Fw (convection + diffusion + forcing).

    Vectorized equivalent of control_env.py:429-530; the reference's
    `for i in range(1, Ny)` row loops become diffs against precomputed
    y-metric arrays padded back onto the ghost rows.
    """
    dx, dz, nu = grid.dx, grid.dz, grid.nu
    y, ym, yg = grid.y, grid.ym, grid.yg
    dyf = (y[1:] - y[:-1])[None, :, None]     # (1, Ny-1, 1) face spacing
    dyg = (yg[1:] - yg[:-1])[None, :, None]   # (1, Ny,   1) center spacing
    dym = (ym[1:] - ym[:-1])[None, :, None]   # (1, Ny-2, 1)

    # ---- Fu --------------------------------------------------------------
    UU = (0.5 * (U + _xp(U))) ** 2
    Fu = -(UU - _xm(UU)) / dx
    UV = (0.5 * (V + _xm(V))) * (0.5 * (U[:, :-1] + U[:, 1:]))  # (Nx,Ny,Nz)
    Fu = Fu - _pad_y((UV[:, 1:] - UV[:, :-1]) / dyf, 1, 1)
    UW = (0.5 * (W + _xm(W))) * (0.5 * (U + _zm(U)))
    Fu = Fu - (_zp(UW) - UW) / dz
    Fu = Fu + nu * (_xp(U) - 2 * U + _xm(U)) / dx ** 2
    dU = (U[:, 1:] - U[:, :-1]) / dyg                            # (Nx,Ny,Nz)
    Fu = Fu + _pad_y(nu * (dU[:, 1:] - dU[:, :-1]) / dyf, 1, 1)
    Fu = Fu + nu * (_zp(U) - 2 * U + _zm(U)) / dz ** 2
    Fu = Fu + dPdx / 2

    # ---- Fv --------------------------------------------------------------
    Fv = -(_xp(UV) - UV) / dx
    VV = (0.5 * (V[:, :-1] + V[:, 1:])) ** 2                     # (Nx,Ny-1,Nz)
    Fv = Fv - _pad_y((VV[:, 1:] - VV[:, :-1]) / dym, 1, 1)
    VW = (0.5 * (V + _zm(V))) * (0.5 * (W[:, :-1] + W[:, 1:]))   # (Nx,Ny,Nz)
    Fv = Fv - (_zp(VW) - VW) / dz
    Fv = Fv + nu * (_xp(V) - 2 * V + _xm(V)) / dx ** 2
    dV = (V[:, 1:] - V[:, :-1]) / dyf                            # (Nx,Ny-1,Nz)
    Fv = Fv + _pad_y(nu * (dV[:, 1:] - dV[:, :-1]) / dym, 1, 1)
    Fv = Fv + nu * (_zp(V) - 2 * V + _zm(V)) / dz ** 2

    # ---- Fw --------------------------------------------------------------
    Fw = -(_xp(UW) - UW) / dx
    Fw = Fw - _pad_y((VW[:, 1:] - VW[:, :-1]) / dyf, 1, 1)
    WW = (0.5 * (W + _zp(W))) ** 2
    Fw = Fw - (WW - _zm(WW)) / dz
    Fw = Fw + nu * (_xp(W) - 2 * W + _xm(W)) / dx ** 2
    dW = (W[:, 1:] - W[:, :-1]) / dyg
    Fw = Fw + _pad_y(nu * (dW[:, 1:] - dW[:, :-1]) / dyf, 1, 1)
    Fw = Fw + nu * (_zp(W) - 2 * W + _zm(W)) / dz ** 2
    return Fu, Fv, Fw


def divergence(grid: ChannelGrid, U, V, W):
    """Cell-centered divergence, shape (Nx, Ny-1, Nz)
    (control_env.py:186-194 / :583-589)."""
    dyf = (grid.y[1:] - grid.y[:-1])[None, :, None]
    Ui = U[:, 1:-1]
    Wi = W[:, 1:-1]
    ux = (_xp(Ui) - Ui) / grid.dx
    uy = (V[:, 1:] - V[:, :-1]) / dyf
    uz = (_zp(Wi) - Wi) / grid.dz
    return ux + uy + uz


def _tridiag_apply(grid: ChannelGrid, kk, P):
    """(DD + kk I) @ P along the y axis; P real-stacked (2, Nx, n, Nzr)
    (or complex (Nx, n, Nzr) — broadcasting handles both), kk
    (Nx, 1, Nzr)."""
    d = grid.DD_diag[None, :, None] + kk
    lo = grid.DD_lower[None, :, None]
    up = grid.DD_upper[None, :, None]
    y_axis = P.ndim - 2
    pad_lo = [(0, 0)] * P.ndim
    pad_lo[y_axis] = (1, 0)
    pad_up = [(0, 0)] * P.ndim
    pad_up[y_axis] = (0, 1)
    sl_lo = [slice(None)] * P.ndim
    sl_lo[y_axis] = slice(None, -1)
    sl_up = [slice(None)] * P.ndim
    sl_up[y_axis] = slice(1, None)
    out = d * P
    out = out + jnp.pad(lo * P[tuple(sl_lo)], pad_lo)
    out = out + jnp.pad(up * P[tuple(sl_up)], pad_up)
    return out


# Solver contractions MUST run at full f32: the TPU MXU's default bf16
# passes give ~1.7e-2 relative error on the eigen-solve (vs 3.4e-4 at
# HIGHEST, measured vs an f64 oracle), which compounds over the 3
# projections per RK3 step into NaN within a few hundred steps.  These
# matmuls are tiny (129x129 x batch) so the 6-pass cost is negligible.
_SOLVE_PREC = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# x/z spectral transforms as exact DFT matmuls.
#
# XLA's TPU FFT runs ~30x below the HBM roofline; profiling shows the
# fft(rfft)/irfft(ifft) round trip is 82% of poisson_solve's cost at the
# reference grid.  At Nx = Nz = 32 the full DFT matrices are tiny and the
# transform becomes a few MXU matmuls at HIGHEST precision — exact (no mode
# truncation: the Nzr spectrum keeps the Nyquist bin), fully real-stacked
# (no complex ops anywhere in the solve path, see CLAUDE.md), and it vmaps
# into batched GEMMs for the multi-env rollout.
# ---------------------------------------------------------------------------

@lru_cache(maxsize=8)
def _env_dft_mats(Nx: int, Nz: int):
    """Host numpy DFT factors: (Cz, Sz) (Nzr, Nz) forward z-rfft rows,
    (Cx, Sx) (Nx, Nx) forward x-fft, (Czi, Szi) (Nzr, Nz) inverse z rows
    with conjugate-pair doubling and the 1/(Nx*Nz) normalization folded
    in.  Cached as numpy (a jnp constant cached across traces leaks
    tracers, cf. ops/sht.py)."""
    Nzr = Nz // 2 + 1
    n = np.arange(Nz)
    f = np.arange(Nzr)
    ang_z = -2.0 * np.pi * np.outer(f, n) / Nz
    Cz, Sz = np.cos(ang_z), np.sin(ang_z)
    g = np.arange(Nx)
    ang_x = -2.0 * np.pi * np.outer(g, g) / Nx
    Cx, Sx = np.cos(ang_x), np.sin(ang_x)
    c = np.full(Nzr, 2.0)
    c[0] = 1.0
    if Nz % 2 == 0:
        c[-1] = 1.0
    scale = c / (Nx * Nz)
    return Cz, Sz, Cx * 1.0, Sx * 1.0, Cz * scale[:, None], Sz * scale[:, None]


def _spectrum_fwd(grid: ChannelGrid, rhs):
    """rhs (..., Nx, n, Nz) real -> real-stacked spectrum
    (2, ..., Nx, n, Nzr): z-rfft then x-fft, both as DFT matmuls
    (replaces jnp.fft.fft(jnp.fft.rfft(rhs, axis=2), axis=0))."""
    Cz, Sz, Cx, Sx, _, _ = _env_dft_mats(grid.Nx, grid.Nz)
    dt = rhs.dtype
    Cz, Sz, Cx, Sx = (jnp.asarray(m, dt) for m in (Cz, Sz, Cx, Sx))
    re = jnp.einsum("...xyz,fz->...xyf", rhs, Cz, precision=_SOLVE_PREC)
    im = jnp.einsum("...xyz,fz->...xyf", rhs, Sz, precision=_SOLVE_PREC)
    re2 = jnp.einsum("...xyf,gx->...gyf", re, Cx, precision=_SOLVE_PREC) \
        - jnp.einsum("...xyf,gx->...gyf", im, Sx, precision=_SOLVE_PREC)
    im2 = jnp.einsum("...xyf,gx->...gyf", re, Sx, precision=_SOLVE_PREC) \
        + jnp.einsum("...xyf,gx->...gyf", im, Cx, precision=_SOLVE_PREC)
    return jnp.stack([re2, im2])


def _spectrum_inv(grid: ChannelGrid, P):
    """Real-stacked spectrum (2, ..., Nx, n, Nzr) -> real field
    (..., Nx, n, Nz): x-ifft then z-irfft with conjugate-pair doubling
    (replaces jnp.fft.irfft(jnp.fft.ifft(p_hat, axis=0), axis=2))."""
    _, _, Cx, Sx, Czi, Szi = _env_dft_mats(grid.Nx, grid.Nz)
    re, im = P[0], P[1]
    dt = re.dtype
    Cx, Sx, Czi, Szi = (jnp.asarray(m, dt) for m in (Cx, Sx, Czi, Szi))
    # inverse x kernel = conj(F): (re + i im)(C - i S)
    re1 = jnp.einsum("...gyf,gx->...xyf", re, Cx, precision=_SOLVE_PREC) \
        + jnp.einsum("...gyf,gx->...xyf", im, Sx, precision=_SOLVE_PREC)
    im1 = jnp.einsum("...gyf,gx->...xyf", im, Cx, precision=_SOLVE_PREC) \
        - jnp.einsum("...gyf,gx->...xyf", re, Sx, precision=_SOLVE_PREC)
    # real part of the doubled z-inverse
    return jnp.einsum("...xyf,fz->...xyz", re1, Czi,
                      precision=_SOLVE_PREC) \
        + jnp.einsum("...xyf,fz->...xyz", im1, Szi, precision=_SOLVE_PREC)


def _solve00_real(grid: ChannelGrid, R00):
    """Equilibrated regularized (0,0)-mode solve on a real-stacked rhs
    R00 (2, n): p = S Pinv_eq (S r), real arithmetic only."""
    s = grid.s00.astype(R00.dtype)
    return s[None, :] * jnp.einsum(
        "ab,cb->ca", grid.Pinv00_eq.astype(R00.dtype), s[None, :] * R00,
        precision=_SOLVE_PREC)


def _set_mode00_real(grid: ChannelGrid, P, p00):
    """P[:, 0, :, 0] <- p00 (both real-stacked) via one-hot mask blending.

    NOTE: complex scatters/matmuls miscompile under vmap on this TPU
    backend (observed: garbage magnitudes only in vmapped runs), which is
    why the whole solve path is real-stacked with masks."""
    Nzr = grid.Nz // 2 + 1
    mask_x = jnp.zeros((grid.Nx, 1, 1), P.dtype).at[0].set(1.0)
    mask_z = jnp.zeros((1, 1, Nzr), P.dtype).at[..., 0].set(1.0)
    mask = (mask_x * mask_z)[None]
    return P * (1.0 - mask) + p00[:, None, :, None] * mask


def _eig_solve_real(grid: ChannelGrid, R, kk):
    """(DD + kk)^-1 on a real-stacked spectrum R (2, Nx, n, Nzr): two dense
    matmuls over y + a diagonal divide — MXU-shaped, ~66 KB of operator
    reads vs the reference's 1024 independent dense solves
    (control_env.py:593-602)."""
    y = jnp.einsum("ab,cxbz->cxaz", grid.eig_B.astype(R.dtype), R,
                   precision=_SOLVE_PREC)
    denom = grid.eig_lam[None, :, None] + kk
    # the near-null eigenvalue at kk=0 (Neumann mean mode) would produce
    # inf; that column is replaced by the dedicated regularized solve, but
    # it must stay finite so masked blending can't create 0*inf = NaN
    denom = jnp.where(jnp.abs(denom) < 1e-12, 1.0, denom)
    y = y / denom[None]
    return jnp.einsum("ab,cxbz->cxaz", grid.eig_A.astype(R.dtype), y,
                      precision=_SOLVE_PREC)


# "auto": fused Pallas solve on TPU for unbatched f32 calls, unfused
# otherwise.  "unfused" forces the XLA path; "fused" forces the kernel.
POISSON_BACKEND = "auto"

# Trace-time override depth: sharded entry points (parallel/sharded_env.py)
# force the unfused path because the opaque pallas_call is invisible to
# GSPMD and would silently REPLICATE instead of partitioning (VERDICT r2
# weak #5 — this used to be a docstring-only guard).
_FORCE_UNFUSED_DEPTH = 0


class force_unfused_poisson:
    """Context manager: while active (i.e. while a sharded program is being
    traced), `poisson_solve` always takes the GSPMD-partitionable XLA path
    regardless of POISSON_BACKEND."""

    def __enter__(self):
        global _FORCE_UNFUSED_DEPTH
        _FORCE_UNFUSED_DEPTH += 1
        return self

    def __exit__(self, *exc):
        global _FORCE_UNFUSED_DEPTH
        _FORCE_UNFUSED_DEPTH -= 1
        return False


def poisson_solve(grid: ChannelGrid, rhs):
    """Solve (d_yy + kxx + kzz) p = rhs — dispatches to the fused Pallas
    kernel (envs/poisson_pallas.py) on TPU, else the XLA path.

    Spatially-sharded (GSPMD) TPU runs must use the unfused path (the
    opaque pallas_call cannot be partitioned); the sharded entry points in
    parallel/sharded_env.py enforce this via `force_unfused_poisson`."""
    if POISSON_BACKEND != "unfused" and _FORCE_UNFUSED_DEPTH == 0 and \
            rhs.ndim == 3 and \
            rhs.dtype == jnp.float32 and (
                POISSON_BACKEND == "fused"
                or jax.default_backend() == "tpu"):
        from .poisson_pallas import poisson_solve_fused
        return poisson_solve_fused(grid, rhs)
    return _poisson_solve_unfused(grid, rhs)


def _poisson_solve_unfused(grid: ChannelGrid, rhs):
    """XLA path: DFT matmuls over z/x, shared eigen-solve over y; the
    regularized (0,0) mean mode (1.5*D[0,0], control_env.py:598-599) gets
    its dedicated inverse.  The spectral solve runs on a real-stacked
    (re, im) axis — complex matmuls/scatters are avoided entirely
    (backend miscompiles them under vmap)."""
    Nzr = grid.Nz // 2 + 1
    R = _spectrum_fwd(grid, rhs)                  # (2, Nx, n, Nzr)
    kk = (grid.kxx[:, None, None]
          + grid.kzz[None, None, :Nzr]).astype(rhs.dtype)
    P = _eig_solve_real(grid, R, kk)
    P = _set_mode00_real(grid, P, _solve00_real(grid, R[:, 0, :, 0]))
    if grid.refine_steps:
        m_x = jnp.zeros((grid.Nx, 1, 1), rhs.dtype).at[0].set(1.0)
        m_z = jnp.zeros((1, 1, Nzr), rhs.dtype).at[..., 0].set(1.0)
        m_y = jnp.zeros((1, grid.Ny - 1, 1), rhs.dtype).at[:, 0].set(1.0)
        m000 = (m_x * m_z * m_y)[None]
        for _ in range(grid.refine_steps):
            r = R - _tridiag_apply(grid, kk, P)
            # regularization correction at the (0,0,0) entry, mask-blended
            r = r - m000 * (0.5 * grid.DD_diag[0]) * P
            corr = _eig_solve_real(grid, r, kk)
            corr = _set_mode00_real(grid, corr,
                                    _solve00_real(grid, r[:, 0, :, 0]))
            P = P + corr
    return _spectrum_inv(grid, P)


def projection_step(grid: ChannelGrid, U, V, W):
    """Pressure projection: make the velocity field divergence-free
    (control_env.py:582-613)."""
    p = poisson_solve(grid, divergence(grid, U, V, W))
    dym = (grid.ym[1:] - grid.ym[:-1])[None, :, None]
    U = U.at[:, 1:-1].add(-(p - _xm(p)) / grid.dx)
    V = V.at[:, 1:-1].add(-(p[:, 1:] - p[:, :-1]) / dym)
    W = W.at[:, 1:-1].add(-(p - _zm(p)) / grid.dz)
    return U, V, W


def calculate_mean_u(grid: ChannelGrid, U):
    """Bulk velocity by trapezoidal integration of the mean profile
    (control_env.py:249-259)."""
    profile = jnp.mean(U[:, 1:-1, :], axis=(0, 2))
    zero = jnp.zeros((1,), U.dtype)
    vals = jnp.concatenate([zero, profile, zero])
    ys = jnp.concatenate([zero, grid.ym.astype(U.dtype),
                          jnp.full((1,), 2.0, U.dtype)])
    return jnp.trapezoid(vals, ys) / 2.0


def _pressure_rhs(grid: ChannelGrid, state: ChannelState):
    Fu, Fv, Fw = compute_rhs(grid, state.U, state.V, state.W, state.dPdx)
    dyf = (grid.y[1:] - grid.y[:-1])[None, :, None]
    fx = (_xp(Fu[:, 1:-1]) - Fu[:, 1:-1]) / grid.dx
    fy = (Fv[:, 1:] - Fv[:, :-1]) / dyf
    fz = (_zp(Fw[:, 1:-1]) - Fw[:, 1:-1]) / grid.dz
    return fx + fy + fz


def compute_pressure(grid: ChannelGrid, state: ChannelState):
    """Observation pressure field from the RHS divergence
    (control_env.py:196-229)."""
    return poisson_solve(grid, _pressure_rhs(grid, state))


def boundary_pressures(grid: ChannelGrid, state: ChannelState):
    """(p1, p2) bottom/top wall pressures (control_env.py:423-427).

    Fast path: only the 4 wall-adjacent y-rows of the pressure are needed,
    so the synthesis matmul uses a 4-row slice of the eigenvector matrix —
    ~32x less solve output than the reference's full-field observation.
    Dispatches to the fused kernel on TPU (RK3_BACKEND gates both)."""
    if _rk3_fused_eligible(state.U):
        from .rk3_pallas import boundary_pressures_fused
        return boundary_pressures_fused(grid, state)
    return _boundary_pressures_unfused(grid, state)


def _boundary_pressures_unfused(grid: ChannelGrid, state: ChannelState):
    rhs = _pressure_rhs(grid, state)
    Nzr = grid.Nz // 2 + 1
    n = grid.Ny - 1
    R = _spectrum_fwd(grid, rhs)
    kk = (grid.kxx[:, None, None]
          + grid.kzz[None, None, :Nzr]).astype(rhs.dtype)
    y = jnp.einsum("ab,cxbz->cxaz", grid.eig_B.astype(rhs.dtype), R,
                   precision=_SOLVE_PREC)
    denom = grid.eig_lam[None, :, None] + kk
    denom = jnp.where(jnp.abs(denom) < 1e-12, 1.0, denom)
    y = y / denom[None]
    rows = jnp.asarray([0, 1, n - 2, n - 1])
    A4 = grid.eig_A[rows].astype(rhs.dtype)
    P4s = jnp.einsum("ab,cxbz->cxaz", A4, y, precision=_SOLVE_PREC)
    p00 = _solve00_real(grid, R[:, 0, :, 0])[:, rows]
    mask_x = jnp.zeros((grid.Nx, 1, 1), rhs.dtype).at[0].set(1.0)
    mask_z = jnp.zeros((1, 1, Nzr), rhs.dtype).at[..., 0].set(1.0)
    mask = (mask_x * mask_z)[None]
    P4s = P4s * (1.0 - mask) + p00[:, None, :, None] * mask
    P4 = _spectrum_inv(grid, P4s)
    p1 = -0.5 * (P4[:, 0, :] + P4[:, 1, :])
    p2 = -0.5 * (P4[:, 3, :] + P4[:, 2, :])
    return p1, p2


# Fused whole-substage stepping (envs/rk3_pallas.py): 'auto' routes
# unbatched f32 steps through the (y, x*z)-layout kernel chain on TPU;
# sharded programs trace under force_unfused_poisson, which forces the
# XLA path here too (the kernels are opaque to GSPMD).
RK3_BACKEND = "auto"


def _rk3_fused_eligible(U):
    return (RK3_BACKEND != "unfused" and _FORCE_UNFUSED_DEPTH == 0
            and U.ndim == 3 and U.dtype == jnp.float32
            and (RK3_BACKEND == "fused" or jax.default_backend() == "tpu"))


def rk3_step(grid: ChannelGrid, state: ChannelState, opV1, opV2
             ) -> ChannelState:
    """One RK3 substep triple + mass-flow correction
    (control_env.py:533-580).  Dispatches to the fused Pallas substage
    chain on TPU (see RK3_BACKEND / envs/rk3_pallas.py)."""
    if _rk3_fused_eligible(state.U):
        from .rk3_pallas import rk3_step_fused
        return rk3_step_fused(grid, state, opV1, opV2)
    return _rk3_step_unfused(grid, state, opV1, opV2)


def _rk3_step_unfused(grid: ChannelGrid, state: ChannelState, opV1, opV2
                      ) -> ChannelState:
    dt = grid.dt
    U0, V0, W0 = state.U, state.V, state.W
    # actuation may arrive from an f32 observer while the env runs f64 (or
    # vice versa); a mixed-dtype wall scatter is a FutureWarning today and a
    # hard error in future JAX — cast at the step boundary once.
    opV1 = jnp.asarray(opV1, V0.dtype)
    opV2 = jnp.asarray(opV2, V0.dtype)
    dPdx = state.dPdx

    def substage(U, V, W, coeffs, Fus):
        Fu, Fv, Fw = compute_rhs(grid, U, V, W, dPdx)
        Fus_new = Fus + [(Fu, Fv, Fw)]
        Un = U0 + dt * sum(c * f[0] for c, f in zip(coeffs, Fus_new))
        Vn = V0 + dt * sum(c * f[1] for c, f in zip(coeffs, Fus_new))
        Wn = W0 + dt * sum(c * f[2] for c, f in zip(coeffs, Fus_new))
        Un, Vn, Wn = apply_boundary_condition(Un, Vn, Wn, opV1, opV2)
        Un, Vn, Wn = projection_step(grid, Un, Vn, Wn)
        Un, Vn, Wn = apply_boundary_condition(Un, Vn, Wn, opV1, opV2)
        return Un, Vn, Wn, Fus_new

    U, V, W, fs = substage(U0, V0, W0, [8 / 15], [])
    U, V, W, fs = substage(U, V, W, [1 / 4, 5 / 12], fs[:1])
    U, V, W, fs = substage(U, V, W, [1 / 4, 0.0, 3 / 4], fs[:1] + [fs[0]])

    # mass-flow correction (control_env.py:574-579)
    meanU_now = calculate_mean_u(grid, U)
    d_new = 2.0 * (state.meanU0 - meanU_now)
    U = U.at[:, 1:-1, :].add(d_new / 2.0)
    dPdx_out = 0.5 * (dPdx + d_new / dt)
    return state.replace(U=U, V=V, W=W, dPdx=dPdx_out)


def init_state(grid: ChannelGrid, key=None, noise: float = 0.0,
               dPdx: float = DEFAULT_DPDX,
               U=None, V=None, W=None, dtype=None) -> ChannelState:
    """Initial condition: laminar Poiseuille profile matching the forcing
    (plus optional perturbation noise to trip turbulence), or explicit
    fields (e.g. loaded from a .mat snapshot)."""
    dtype = dtype or grid.y.dtype
    Nx, Ny, Nz = grid.Nx, grid.Ny, grid.Nz
    if U is None:
        yg = np.asarray(grid.yg, np.float64)
        u_prof = dPdx / (2 * grid.nu) * yg * (2.0 - yg) / 2.0
        U = jnp.broadcast_to(
            jnp.asarray(u_prof, dtype)[None, :, None], (Nx, Ny + 1, Nz))
        V = jnp.zeros((Nx, Ny, Nz), dtype)
        W = jnp.zeros((Nx, Ny + 1, Nz), dtype)
        if noise > 0 and key is not None:
            ku, kv, kw = jax.random.split(key, 3)
            U = U + noise * jax.random.normal(ku, U.shape, dtype)
            V = V + noise * jax.random.normal(kv, V.shape, dtype)
            W = W + noise * jax.random.normal(kw, W.shape, dtype)
            # make the perturbed field a valid DNS state: no-slip walls +
            # divergence-free interior (the reference loads an already
            # projected turbulence snapshot from disk)
            zeros = jnp.zeros((Nx, Nz), dtype)
            U, V, W = apply_boundary_condition(U, V, W, zeros, zeros)
            U, V, W = projection_step(grid, U, V, W)
            U, V, W = apply_boundary_condition(U, V, W, zeros, zeros)
    else:
        U = jnp.asarray(U, dtype)
        V = jnp.asarray(V, dtype)
        W = jnp.asarray(W, dtype)
    state = ChannelState(
        U=U, V=V, W=W,
        dPdx=jnp.asarray(dPdx, dtype),
        meanU0=jnp.asarray(0.0, dtype))
    return state.replace(meanU0=calculate_mean_u(grid, U))


# ---------------------------------------------------------------------------
# scores / metrics (control_env.py:182-340)
# ---------------------------------------------------------------------------

def shear_stress(grid: ChannelGrid, state: ChannelState):
    """|mean(-u_wall v_wall + nu dU/dy)| at the top wall
    (control_env.py:292-303)."""
    U, V = state.U, state.V
    dudy = (U[:, -1, :] - U[:, -2, :]) / (grid.y[-1] - grid.y[-2])
    tau = -U[:, -1, :] * V[:, -1, :] + grid.nu * dudy
    return jnp.abs(jnp.mean(tau))


def speed_norm(state: ChannelState):
    return (jnp.linalg.norm(state.U) + jnp.linalg.norm(state.V)
            + jnp.linalg.norm(state.W))


def dpdx_finite_difference(grid: ChannelGrid, p2):
    """Mean |dp/dx| of the top-wall pressure (control_env.py:240-247)."""
    grad = (p2[1:, :] - p2[:-1, :]) / grid.dx
    return jnp.abs(jnp.mean(jnp.abs(grad), axis=1).sum() / (p2.shape[0] - 1))


def reward_divergence(grid: ChannelGrid, state: ChannelState,
                      bound: float = -100.0):
    div = divergence(grid, state.U, state.V, state.W)
    return jnp.maximum(-jnp.abs(jnp.sum(div)), bound)


def step_metrics(grid: ChannelGrid, state: ChannelState, p2):
    """The drag-reduction scoreboard (control_env.py:651-661)."""
    return {
        "drag_reduction/1_shear_stress": shear_stress(grid, state),
        "drag_reduction/2_1_mass_flow": calculate_mean_u(grid, state.U),
        "drag_reduction/2_2_v_velocity": jnp.mean(jnp.abs(state.V)),
        "drag_reduction/2_3_w_velocity": jnp.mean(jnp.abs(state.W)),
        "drag_reduction/3_1_pressure_mean": jnp.mean(p2),
        "drag_reduction/3_2_dPdx_finite_difference":
            dpdx_finite_difference(grid, p2),
        "drag_reduction/3_3_dPdx_reverse_cal": state.dPdx,
        "drag_reduction/4_1_-|divergence|": reward_divergence(grid, state),
        "drag_reduction/4_4_speed_norm": speed_norm(state),
    }


@partial(jax.jit, static_argnums=())
def env_step(grid: ChannelGrid, state: ChannelState, opV1, opV2):
    """Full environment step: advance + observe + score
    (control_env.py:639-664).  Returns (state', p2, div_reward, info).

    For repeated stepping use the scan-based entry points (rollout /
    control.loop.closed_loop_chunk) — they carry the fused kernels'
    layout across steps instead of converting here per call."""
    if _rk3_fused_eligible(state.U):
        from .rk3_pallas import env_step_k, kstate_to_state, state_to_kstate
        dtype = state.U.dtype
        kst, p2, info = env_step_k(grid, state_to_kstate(state), opV1, opV2)
        state = kstate_to_state(grid, kst, dtype)
        return state, p2, info["drag_reduction/4_1_-|divergence|"], info
    state = rk3_step(grid, state, opV1, opV2)
    p1, p2 = boundary_pressures(grid, state)
    info = step_metrics(grid, state, p2)
    return state, p2, info["drag_reduction/4_1_-|divergence|"], info


def gt_control(state: ChannelState, detect_plane: int):
    """Opposition control: negate V at the detection planes
    (control_env.py:416-421).  Handles both the (Nx, Ny, Nz) layout and
    the fused scan's kernel layout (rows=y, cols=x*Nz+z 2-D leaves,
    envs/rk3_pallas.state_to_kstate)."""
    V = state.V
    if V.ndim == 2:  # kernel layout: rows are y; planes come out (C,)
        return -V[detect_plane], -V[V.shape[0] - detect_plane]
    opV1 = -state.V[:, detect_plane, :]
    opV2 = -state.V[:, -detect_plane, :]
    return opV1, opV2


def rand_control(key, shape, scale: float = 0.01):
    """Random actuation (matlab compute_opposition.m: 0.01*rand)."""
    return scale * jax.random.uniform(key, shape)


@partial(jax.jit, static_argnames=("n_steps", "detect_plane", "policy",
                                   "collect_fields"))
def rollout(grid: ChannelGrid, state: ChannelState, n_steps: int,
            detect_plane: int = 25, policy: str = "gt",
            key: Optional[jnp.ndarray] = None,
            collect_fields: bool = False):
    """Closed-loop rollout fully on device: the policy (opposition / random /
    none) is evaluated inside the scan, so there is no per-step host sync.

    Returns (state', outs) where outs stacks per-step (p2, v_plane, dPdx
    [, U, V, W]).  This is the data-collection engine replacing the
    reference's Python control loop (run_control.py:135-296).
    """
    if key is None:
        key = jax.random.PRNGKey(0)

    fused = _rk3_fused_eligible(state.U)
    if fused:
        from . import rk3_pallas as rk
        in_dtype = state.U.dtype
        state = rk.state_to_kstate(state)

    def body(carry, k):
        st = carry
        if policy == "gt":
            opV1, opV2 = gt_control(st, detect_plane)
        elif policy == "rand":
            k1, k2 = jax.random.split(k)
            opV1 = rand_control(k1, (grid.Nx, grid.Nz)).astype(st.U.dtype)
            opV2 = rand_control(k2, (grid.Nx, grid.Nz)).astype(st.U.dtype)
        else:
            opV1 = jnp.zeros((grid.Nx, grid.Nz), st.U.dtype)
            opV2 = opV1
        if fused:
            from . import rk3_pallas as rk
            C = grid.Nx * grid.Nz
            op1 = jnp.reshape(opV1, (1, C))
            op2 = jnp.reshape(opV2, (1, C))
            if rk.FULLSTEP:
                U, V, W, dP1, p = rk.env_step_full_kb(
                    grid, 1, st.U, st.V, st.W,
                    jnp.reshape(st.dPdx, (1,)),
                    jnp.reshape(st.meanU0, (1,)), op1, op2)
                dPdx = jnp.reshape(dP1, st.dPdx.shape)
                p2 = p[1:2]
            else:
                U, V, W, dPdx = rk.rk3_step_k(grid, st.U, st.V, st.W,
                                              st.dPdx, st.meanU0, op1, op2)
                _, p2 = rk.boundary_pressures_k(grid, U, V, W, dPdx)
            st = st.replace(U=U, V=V, W=W, dPdx=dPdx)
            p2 = p2.reshape(grid.Nx, grid.Nz)
            v_plane = V[V.shape[0] - detect_plane].reshape(grid.Nx,
                                                           grid.Nz)
        else:
            st = rk3_step(grid, st, opV1, opV2)
            _, p2 = boundary_pressures(grid, st)
            v_plane = st.V[:, -detect_plane, :]
        out = (p2, v_plane, st.dPdx)
        if collect_fields:
            out = out + (st.U, st.V, st.W)
        return st, out

    keys = jax.random.split(key, n_steps)
    state, outs = jax.lax.scan(body, state, keys, length=n_steps)
    if fused:
        from . import rk3_pallas as rk
        state = rk.kstate_to_state(grid, state, in_dtype)
        if collect_fields:
            # collected fields come out stacked kernel-layout (T, R, C);
            # convert once after the scan
            p2s, vps, dps, Us, Vs, Ws = outs
            conv = jax.vmap(lambda a: rk.from_k(a, grid.Nx, grid.Nz))
            outs = (p2s, vps, dps, conv(Us).astype(in_dtype),
                    conv(Vs).astype(in_dtype), conv(Ws).astype(in_dtype))
    return state, outs


@partial(jax.jit, static_argnames=("n_steps", "detect_plane", "policy",
                                   "collect_fields"))
def batched_rollout(grid: ChannelGrid, states: ChannelState, n_steps: int,
                    detect_plane: int = 25, policy: str = "gt",
                    keys: Optional[jnp.ndarray] = None,
                    collect_fields: bool = False):
    """Closed-loop rollout over a batch of independent environments
    (leading batch axis on every ChannelState leaf) — the data-collection
    throughput multiplier the reference's sequential MATLAB loop cannot
    express.

    On TPU (f32) the batch is packed into the fused kernels' lane axis —
    state (rows, B*Nx*Nz), one pallas_call per kernel per substage with
    grid=(B,) (envs/rk3_pallas.py batched section) — so the whole batch
    costs 7 kernel dispatches per step instead of B x 7 (the vmapped
    fallback's regime, which measured 8.1x single-env per-step cost at
    B=8 in round 2).  Elsewhere (CPU, f64) it vmaps the single-env
    rollout.  NOTE: the packed path derives its random-policy draws from
    `keys[0]` only (draws remain independent across envs and steps)."""
    B = states.U.shape[0]
    if keys is None:
        keys = jax.random.split(jax.random.PRNGKey(0), B)
    # packed blocks are (rows, Nx*Nz) column tiles: Mosaic needs the lane
    # dim divisible by 128 (production grids: 32x32=1024 ok)
    if _rk3_fused_eligible(states.U[0]) and (grid.Nx * grid.Nz) % 128 == 0:
        from . import rk3_pallas as rk
        in_dtype = states.U.dtype
        C = grid.Nx * grid.Nz
        kst = rk.batch_states(states)

        def body(carry, k):
            st = carry
            if policy == "gt":
                o1, o2 = gt_control(st, detect_plane)       # (B*C,) each
                op1, op2 = o1[None], o2[None]
            elif policy == "rand":
                k1, k2 = jax.random.split(k)
                op1 = rand_control(k1, (1, B * C)).astype(st.U.dtype)
                op2 = rand_control(k2, (1, B * C)).astype(st.U.dtype)
            else:
                op1 = jnp.zeros((1, B * C), st.U.dtype)
                op2 = op1
            if rk.FULLSTEP:
                U, V, W, dPdx, p = rk.env_step_full_kb(
                    grid, B, st.U, st.V, st.W, st.dPdx, st.meanU0,
                    op1, op2)
                p2 = p[1:2]
            else:
                U, V, W, dPdx = rk.rk3_step_kb(grid, B, st.U, st.V, st.W,
                                               st.dPdx, st.meanU0, op1,
                                               op2)
                _, p2 = rk.boundary_pressures_kb(grid, B, U, V, W, dPdx)
            st = st.replace(U=U, V=V, W=W, dPdx=dPdx)
            v_plane = V[V.shape[0] - detect_plane][None]     # (1, B*C)
            out = (p2, v_plane, dPdx)
            if collect_fields:
                out = out + (U, V, W)
            return st, out

        step_keys = jax.random.split(keys[0], n_steps)
        kst, outs = jax.lax.scan(body, kst, step_keys, length=n_steps)
        state_out = rk.unbatch_states(grid, kst, B, in_dtype)

        def planes(a):   # (T, 1, B*C) -> (B, T, Nx, Nz)
            return jnp.transpose(
                a.reshape(n_steps, B, grid.Nx, grid.Nz), (1, 0, 2, 3))

        p2s, vps, dps = outs[:3]
        conv = (planes(p2s), planes(vps), jnp.transpose(dps, (1, 0)))
        if collect_fields:
            def fields(a):  # (T, R, B*C) -> (B, T, Nx, R, Nz)
                R = a.shape[1]
                return jnp.transpose(
                    a.reshape(n_steps, R, B, grid.Nx, grid.Nz),
                    (2, 0, 3, 1, 4)).astype(in_dtype)
            conv = conv + tuple(fields(a) for a in outs[3:])
        return state_out, conv
    return jax.vmap(
        lambda s, k: rollout(grid, s, n_steps, detect_plane=detect_plane,
                             policy=policy, key=k,
                             collect_fields=collect_fields))(states, keys)


def init_batched_states(grid: ChannelGrid, n_envs: int, key,
                        noise: float = 0.05,
                        dPdx: float = DEFAULT_DPDX) -> ChannelState:
    keys = jax.random.split(key, n_envs)
    return jax.vmap(
        lambda k: init_state(grid, key=k, noise=noise, dPdx=dPdx))(keys)


# ---------------------------------------------------------------------------
# Developed-turbulence initial condition
#
# The reference starts every run from a statistically developed turbulence
# snapshot shipped on disk (channel180_minchan.mat, loaded at
# control_env.py:149-180).  We don't have that file, so we generate the
# equivalent state: seed a turbulent MEAN profile (so the constant-mass-flux
# constraint locks onto the turbulent bulk velocity, not the laminar one)
# plus finite-amplitude streamwise vortices to trip transition, then let the
# DNS spin up until wall shear statistics equilibrate near Re_tau ~ 180
# (scripts/spinup_turbulence.py drives this and checkpoints the snapshot).
# ---------------------------------------------------------------------------

def reichardt_profile(y_plus, kappa: float = 0.41):
    """Reichardt's composite law-of-the-wall mean profile u+(y+): smooth
    blend of the viscous sublayer and the log layer — the standard
    analytic seed for a turbulent channel mean flow."""
    y_plus = np.asarray(y_plus, np.float64)
    return (np.log1p(kappa * y_plus) / kappa
            + 7.8 * (1.0 - np.exp(-y_plus / 11.0)
                     - (y_plus / 11.0) * np.exp(-y_plus / 3.0)))


def init_turbulent_state(grid: ChannelGrid, key,
                         dPdx: float = DEFAULT_DPDX,
                         vortex_amp: float = 3.0,
                         noise: float = 0.02,
                         n_vortex_pairs: int = 2) -> ChannelState:
    """Tripped turbulent-transition IC: Reichardt mean profile + pairs of
    counter-rotating streamwise vortices (amplitude `vortex_amp` in wall
    units) + broadband noise, wall-corrected and projected divergence-free.

    The mass-flow target (state.meanU0) comes from the Reichardt profile's
    bulk, so the fixed-flux constraint holds the flow at the turbulent
    operating point (Re_b ~ 2800 at Re_tau ~ 180) during and after spinup.
    """
    utau = math.sqrt(dPdx)
    dtype = grid.y.dtype
    Nx, Ny, Nz = grid.Nx, grid.Ny, grid.Nz
    yg = np.asarray(grid.yg, np.float64)           # (Ny+1,) U/W centers
    ym = np.asarray(grid.ym, np.float64)           # (Ny-1,)
    nu = grid.nu

    # mean profile on U's y-points: distance to the NEAREST wall in [0, 1]
    d_wall = np.minimum(np.abs(yg), np.abs(2.0 - yg))
    u_mean = utau * reichardt_profile(d_wall * utau / nu)

    # streamwise vortices: psi(y, z) = A sin(pi yb/2) sin(2 pi k z / Lz)
    # (yb in [0,2]) -> V' = dpsi/dz, W' = -dpsi/dy; x-independent rolls are
    # the optimal transient-growth seed for streak formation.
    A = vortex_amp * utau
    Lz = grid.dz * Nz
    z_c = (np.arange(Nz) + 0.5) * grid.dz          # cell centers
    z_f = np.arange(Nz) * grid.dz                  # faces (for W)
    kz = 2 * math.pi * n_vortex_pairs / Lz

    y_faces = np.asarray(grid.y, np.float64)       # (Ny,) V lives on faces
    sin_y_f = np.sin(math.pi * y_faces / 2.0)
    cos_y_c = np.cos(math.pi * yg / 2.0)

    Vp = A * kz * sin_y_f[None, :, None] * np.cos(kz * z_c)[None, None, :]
    Wp = -A * (math.pi / 2.0) * cos_y_c[None, :, None] \
        * np.sin(kz * z_f)[None, None, :]

    U = jnp.broadcast_to(jnp.asarray(u_mean, dtype)[None, :, None],
                         (Nx, Ny + 1, Nz))
    V = jnp.broadcast_to(jnp.asarray(Vp, dtype), (Nx, Ny, Nz))
    W = jnp.broadcast_to(jnp.asarray(Wp, dtype), (Nx, Ny + 1, Nz))

    ku, kv, kw = jax.random.split(key, 3)
    damp = jnp.asarray(np.minimum(d_wall, 0.3) / 0.3, dtype)  # keep walls clean
    U = U + noise * jax.random.normal(ku, U.shape, dtype) * damp[None, :, None]
    V = V + noise * jax.random.normal(kv, V.shape, dtype) \
        * jnp.asarray(np.sin(math.pi * y_faces / 2.0), dtype)[None, :, None]
    W = W + noise * jax.random.normal(kw, W.shape, dtype) * damp[None, :, None]

    zeros = jnp.zeros((Nx, Nz), dtype)
    U, V, W = apply_boundary_condition(U, V, W, zeros, zeros)
    U, V, W = projection_step(grid, U, V, W)
    U, V, W = apply_boundary_condition(U, V, W, zeros, zeros)

    state = ChannelState(U=U, V=V, W=W,
                         dPdx=jnp.asarray(dPdx, dtype),
                         meanU0=jnp.asarray(0.0, dtype))
    return state.replace(meanU0=calculate_mean_u(grid, U))


@partial(jax.jit, static_argnames=("n_steps",))
def spinup_chunk(grid: ChannelGrid, state: ChannelState, n_steps: int):
    """Advance `n_steps` with zero actuation, accumulating spinup statistics
    on device (ONE host fetch per chunk): per-step top/bottom wall shear,
    bulk velocity, and dPdx — the signals used to detect a statistically
    developed state."""

    def body(st, _):
        st = rk3_step(grid, st,
                      jnp.zeros((grid.Nx, grid.Nz), st.U.dtype),
                      jnp.zeros((grid.Nx, grid.Nz), st.U.dtype))
        U, V = st.U, st.V
        dudy_b = (U[:, 1, :] - U[:, 0, :]) / (grid.y[1] - grid.y[0])
        dudy_t = (U[:, -1, :] - U[:, -2, :]) / (grid.y[-1] - grid.y[-2])
        tau_b = jnp.mean(grid.nu * dudy_b)
        tau_t = jnp.mean(-U[:, -1, :] * V[:, -1, :] + grid.nu * dudy_t)
        stats = jnp.stack([tau_b, jnp.abs(tau_t),
                           calculate_mean_u(grid, U), st.dPdx])
        return st, stats

    return jax.lax.scan(body, state, None, length=n_steps)
