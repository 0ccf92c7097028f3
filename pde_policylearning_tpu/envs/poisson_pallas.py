"""Fused Pallas kernel for the channel Poisson solve.

The unfused `channel_flow.poisson_solve` lowers to ~15 small XLA kernels
(DFT matmuls, eigen-solve matmuls, mask blends, refinement stencil); at the
reference grid (32x130x32, ~0.5 MB state) each dispatch costs ~10 us, so
the solve is latency-bound at ~0.12 ms.  This kernel runs the ENTIRE chain
in one `pallas_call` with everything resident in VMEM (~12 MB):

    combined x/z forward DFT -> eigen solve (B @ . / (lam+kk) -> A @ .)
    -> regularized (0,0)-mode solve -> iterative-refinement pass(es)
    -> combined inverse DFT (conjugate-pair doubling folded in)

Kernel-design constraints that shaped the layout (learned on hardware):
Mosaic rejects cross-lane reshapes like (Nx*n, Nzr) -> (Nx, n*Nzr), so
everything lives in ONE 2-D layout (rows = wall-normal y, cols = x*z /
x*kz) where each transform is a RIGHT matmul with a precomputed Kronecker
matrix (kron(Fx, Fz), ~2.2 MB each) and the eigen solve is a LEFT matmul —
zero in-kernel transposes or reshapes.  The (y-major, x*z-minor) transposes
happen outside in XLA (2 cheap ops).

Matmuls use HIGHEST precision with f32 accumulation — the solver-accuracy
requirement from channel_flow._SOLVE_PREC applies identically here (bf16
passes NaN the DNS).

Gradients: `poisson_solve_fused` carries a custom VJP that delegates to
the unfused implementation (env training paths are not throughput-
critical), so `jax.grad` through the env still works.

reference: the per-wavenumber solves of control_env.py:593-602.
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HP = jax.lax.Precision.HIGHEST   # Mosaic supports DEFAULT|HIGHEST only; solver needs f32


@lru_cache(maxsize=8)
def _kron_mats(Nx: int, Nz: int):
    """Host numpy combined transform matrices.

    Forward T (Nx*Nz, Nx*Nzr): row (x_in*Nz + z), col (x_out*Nzr + f),
    T = kron(Fx, Fz) with Fx = exp(-2i pi x_in x_out / Nx) and
    Fz = exp(-2i pi f z / Nz).  Inverse Ti (Nx*Nzr, Nx*Nz) carries the
    conjugate kernels, the conjugate-pair doubling c_f, and the
    1/(Nx*Nz) normalization.  Cached as numpy (jnp constants cached
    across traces leak tracers)."""
    Nzr = Nz // 2 + 1
    z = np.arange(Nz)
    f = np.arange(Nzr)
    x = np.arange(Nx)
    Fz = np.exp(-2j * np.pi * np.outer(z, f) / Nz)        # (Nz, Nzr)
    Fx = np.exp(-2j * np.pi * np.outer(x, x) / Nx)        # (Nx, Nx) sym
    T = np.kron(Fx, Fz)                                   # (Nx*Nz, Nx*Nzr)
    c = np.full(Nzr, 2.0)
    c[0] = 1.0
    if Nz % 2 == 0:
        c[-1] = 1.0
    Fzi = (c[:, None] * np.exp(2j * np.pi * np.outer(f, z) / Nz)
           / (Nx * Nz))                                   # (Nzr, Nz)
    Fxi = np.exp(2j * np.pi * np.outer(x, x) / Nx)        # (Nx, Nx) sym
    Ti = np.kron(Fxi, Fzi)                                # (Nx*Nzr, Nx*Nz)
    f32 = np.float32
    return (np.ascontiguousarray(T.real, f32),
            np.ascontiguousarray(T.imag, f32),
            np.ascontiguousarray(Ti.real, f32),
            np.ascontiguousarray(Ti.imag, f32))


def _kernel(n, F, refine_steps,
            Y_ref, TR_ref, TI_ref, TiR_ref, TiI_ref,
            A_ref, B_ref, denom_ref, kk_ref, Pinv00_ref, s00_ref,
            dd_ref, dl_ref, du_ref, dd0h_ref, out_ref):
    """Single-program kernel.  Y (n, Nx*Nz) real; spectra (n, F=Nx*Nzr);
    column 0 of the spectral layout is the (kx=0, kz=0) mode."""

    def dot(a, b):
        return jax.lax.dot(a, b, precision=_HP,
                           preferred_element_type=jnp.float32)

    Y = Y_ref[...]
    t_re = dot(Y, TR_ref[...])             # (n, F)
    t_im = dot(Y, TI_ref[...])

    A = A_ref[...]
    B = B_ref[...]
    denom = denom_ref[...]                 # (n, F), zero-guarded outside
    Pinv00 = Pinv00_ref[...]
    s00 = s00_ref[...]                     # (n, 1)
    col0 = jax.lax.broadcasted_iota(jnp.int32, (1, F), 1) == 0
    mask0 = jnp.where(col0, 1.0, 0.0)      # (1, F)

    def eig_solve(r_re, r_im):
        P_re = dot(A, dot(B, r_re) / denom)
        P_im = dot(A, dot(B, r_im) / denom)
        # regularized (0,0) mean mode replaces column 0
        p00_re = s00 * dot(Pinv00, s00 * r_re[:, 0:1])
        p00_im = s00 * dot(Pinv00, s00 * r_im[:, 0:1])
        P_re = P_re * (1.0 - mask0) + p00_re * mask0
        P_im = P_im * (1.0 - mask0) + p00_im * mask0
        return P_re, P_im

    P_re, P_im = eig_solve(t_re, t_im)

    if refine_steps:
        kk = kk_ref[...]                   # (1, F)
        dd = dd_ref[...]                   # (n, 1)
        dl = dl_ref[...]                   # (n, 1): row 0 zero
        du = du_ref[...]                   # (n, 1): row n-1 zero
        row0 = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0) == 0
        m00 = jnp.where(row0, 1.0, 0.0) * mask0    # (n, F)
        dd0_half = dd0h_ref[0, 0]
        zrow = jnp.zeros((1, F), jnp.float32)

        def tridiag(P):
            app = (dd + kk) * P
            app = app + dl * jnp.concatenate([zrow, P[:-1]], axis=0)
            app = app + du * jnp.concatenate([P[1:], zrow], axis=0)
            return app

        for _ in range(refine_steps):
            r_re = t_re - tridiag(P_re) - m00 * (dd0_half * P_re)
            r_im = t_im - tridiag(P_im) - m00 * (dd0_half * P_im)
            c_re, c_im = eig_solve(r_re, r_im)
            P_re = P_re + c_re
            P_im = P_im + c_im

    # inverse: real part of (P_re + i P_im) @ (TiR + i TiI)
    out_ref[...] = dot(P_re, TiR_ref[...]) - dot(P_im, TiI_ref[...])


def _solve_impl(grid, rhs, interpret: bool = False):
    Nx, Ny, Nz = grid.Nx, grid.Ny, grid.Nz
    n = Ny - 1
    Nzr = Nz // 2 + 1
    F = Nx * Nzr
    TR, TI, TiR, TiI = _kron_mats(Nx, Nz)

    f32 = jnp.float32
    kxx = grid.kxx.astype(f32)
    kzz = grid.kzz.astype(f32)[:Nzr]
    kk = (kxx[:, None] + kzz[None, :]).reshape(1, F)
    denom = grid.eig_lam.astype(f32)[:, None] + kk     # (n, F)
    denom = jnp.where(jnp.abs(denom) < 1e-12, 1.0, denom)
    dl = jnp.concatenate([jnp.zeros((1,), f32),
                          grid.DD_lower.astype(f32)]).reshape(n, 1)
    du = jnp.concatenate([grid.DD_upper.astype(f32),
                          jnp.zeros((1,), f32)]).reshape(n, 1)
    dd0h = (0.5 * grid.DD_diag[:1].astype(f32)).reshape(1, 1)

    Y = jnp.transpose(rhs.astype(f32), (1, 0, 2)).reshape(n, Nx * Nz)
    kernel = partial(_kernel, n, F, grid.refine_steps)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, Nx * Nz), f32),
        interpret=interpret,
    )(Y, jnp.asarray(TR), jnp.asarray(TI), jnp.asarray(TiR),
      jnp.asarray(TiI), grid.eig_A.astype(f32), grid.eig_B.astype(f32),
      denom, kk, grid.Pinv00_eq.astype(f32),
      grid.s00.astype(f32).reshape(n, 1),
      grid.DD_diag.astype(f32).reshape(n, 1), dl, du, dd0h)
    return jnp.transpose(out.reshape(n, Nx, Nz), (1, 0, 2))


@jax.custom_vjp
def poisson_solve_fused(grid, rhs):
    """Fused-VMEM Poisson solve (f32).  Numerically equivalent to
    `channel_flow.poisson_solve` (same eigen-factorization, same
    regularized mean mode, same refinement)."""
    return _solve_impl(grid, rhs)


def _fwd(grid, rhs):
    return _solve_impl(grid, rhs), (grid, rhs)


def _bwd(res, g):
    # delegate to the unfused implementation's VJP; the grid is constant
    # geometry (zero cotangent) — nothing differentiates wrt it
    from . import channel_flow as cf
    grid, rhs = res
    _, vjp = jax.vjp(lambda r: cf._poisson_solve_unfused(grid, r), rhs)
    (drhs,) = vjp(g.astype(rhs.dtype))
    zero_grid = jax.tree.map(jnp.zeros_like, grid)
    return zero_grid, drhs


poisson_solve_fused.defvjp(_fwd, _bwd)
