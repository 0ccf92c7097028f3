"""Whole-substage fused RK3 kernels in the Poisson solve's (y, x*z) layout.

Round-2 lesson (NOTES_r2): fusing *pieces* of the step as separate Pallas
calls regresses the closed loop ~9x — XLA inserts operand-layout copies
around every kernel.  The fix implemented here is to keep the ENTIRE
stepping loop in one layout — rows = wall-normal y, columns = x*Nz + z
(exactly the fused Poisson kernel's layout, envs/poisson_pallas.py) — so
the state never changes layout between kernels:

    kernel A (per substage): momentum RHS + RK update + no-slip/actuation
        BC + cell divergence, all elementwise/VPU work on VMEM-resident
        state; x-shifts are lane rolls by +-Nz, z-shifts are masked
        lane-roll pairs (cols are x-major z-minor), y-stencils are sublane
        slices.
    kernel B (per substage): the eigen-factorized Poisson solve (same math
        as poisson_pallas._kernel) + pressure-gradient correction + BC —
        the projected substage state comes out in the same layout.
    kernel C (per env step): boundary pressures — pressure RHS (shares
        kernel A's stencil code) + spectral synthesis of the 4
        wall-adjacent rows only.

One env step = 3x(A+B) + C = 7 Pallas dispatches + scalar XLA glue
(mass-flow correction, scoreboard), vs ~60 XLA kernels on the unfused
path.  The closed-loop rollout (`channel_flow.rollout` routes here on
TPU) carries the state in kernel layout across the whole scan; layout
conversion happens once per rollout, not per step.

Precision: stencils/updates are exact f32 VPU ops; only the Poisson
matmuls use HIGHEST (the channel_flow._SOLVE_PREC requirement).

Gradients: `rk3_step_fused` and `boundary_pressures_fused` carry custom
VJPs that delegate to the unfused XLA implementations (differentiable-
physics training is not throughput-bound; the fused path serves rollout/
serving).

reference: libs/envs/control_env.py:429-613 (RHS/step/projection),
:423-427 (boundary pressures).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .poisson_pallas import _kron_mats

# Solve-matmul precision knob (import-time env var, perf experiments only).
# 'highest' = full f32 (6-pass bf16 on the MXU) — the accuracy contract of
# CLAUDE.md / channel_flow._SOLVE_PREC.  'high' = 3-pass bf16x3: ~2x MXU
# throughput, ~1e-6 relative solve error before the refinement pass (vs
# ~1e-7) — measured drift numbers in NOTES_r4 before changing the default.
import os as _os

_HP = {"highest": jax.lax.Precision.HIGHEST,
       "high": jax.lax.Precision.HIGH}[
    _os.environ.get("PDE_SOLVE_PRECISION", "highest")]

# Test hook: run every pallas_call in interpret mode (CPU suite coverage
# of the packed batched rollout path, tests/test_rk3_fused.py).
INTERPRET = False

# Whole-step kernel D (one pallas dispatch per env step): flips
# env_step_k and the rollout/batched_rollout scan bodies from the staged
# 3x(A+B)+C path onto env_step_full_k(b).  DEFAULT ON since the round-5
# on-chip A/B validated it (results/logs/fullstep_probe_r5.log: 50-step
# trajectory shear parity within 2% of the staged path, scoreboard metrics
# rel<=5e-3; closed-loop 6515 vs 5455 steps/s single-env, 7568 vs 7002
# aggregate at B=32 — the staged path round-trips state through HBM ~6x
# per step, kernel D keeps it VMEM-resident).  PDE_RK3_FULLSTEP=0 restores
# the staged path; tests cover both routings (tests/test_rk3_fused.py).
FULLSTEP = _os.environ.get("PDE_RK3_FULLSTEP", "1") == "1"


# ---------------------------------------------------------------------------
# layout helpers: (Nx, R, Nz) <-> (R, Nx*Nz)  (rows = y, x-major z-minor)
# ---------------------------------------------------------------------------

def to_k(a):
    """(Nx, R, Nz) -> (R, Nx*Nz)."""
    Nx, R, Nz = a.shape
    return jnp.transpose(a, (1, 0, 2)).reshape(R, Nx * Nz)


def from_k(a, Nx, Nz):
    """(R, Nx*Nz) -> (Nx, R, Nz)."""
    R = a.shape[0]
    return jnp.transpose(a.reshape(R, Nx, Nz), (1, 0, 2))


def state_to_k(state):
    """ChannelState -> kernel-layout leaf tuple (U, V, W)."""
    return to_k(state.U), to_k(state.V), to_k(state.W)


# ---------------------------------------------------------------------------
# in-kernel shift/stencil helpers (shared by kernels A and C)
# ---------------------------------------------------------------------------

def _shifts(Nz, C):
    """Return (xm, xp, zm, zp) lane-shift closures for (rows, C) values.

    cols = x*Nz + z.  x-shifts wrap the whole lane axis (roll by +-Nz);
    z-shifts wrap within each Nz-column group: one main roll plus a
    correction roll selected on the group-boundary columns."""
    col = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
    z0 = (col % Nz) == 0          # z == 0 columns
    zl = (col % Nz) == (Nz - 1)   # z == Nz-1 columns

    def roll(a, s):  # pltpu.roll requires shift >= 0: jnp.roll semantics
        return pltpu.roll(a, s % C, 1)

    def xm(a):
        return roll(a, Nz)

    def xp(a):
        return roll(a, -Nz)

    def zm(a):
        return jnp.where(z0, roll(a, 1 - Nz), roll(a, 1))

    def zp(a):
        return jnp.where(zl, roll(a, Nz - 1), roll(a, -1))

    return xm, xp, zm, zp


def _rhs_terms(U, V, W, dPdx, nu, dx, dz, dyf, dyg, dym, sh):
    """Momentum RHS in kernel layout; mirrors channel_flow._compute_rhs_
    unfused term by term (y slices instead of axis-1 slices).
    U, W: (Ny+1, C); V: (Ny, C).  Returns Fu (Ny+1, C), Fv (Ny, C),
    Fw (Ny+1, C)."""
    xm, xp, zm, zp = sh

    def pad_y(a):
        z = jnp.zeros((1, a.shape[1]), a.dtype)
        return jnp.concatenate([z, a, z], axis=0)

    # ---- Fu
    UU = (0.5 * (U + xp(U))) ** 2
    Fu = -(UU - xm(UU)) / dx
    UV = (0.5 * (V + xm(V))) * (0.5 * (U[:-1] + U[1:]))        # (Ny, C)
    Fu = Fu - pad_y((UV[1:] - UV[:-1]) / dyf)
    UW = (0.5 * (W + xm(W))) * (0.5 * (U + zm(U)))
    Fu = Fu - (zp(UW) - UW) / dz
    Fu = Fu + nu * (xp(U) - 2 * U + xm(U)) / dx ** 2
    dU = (U[1:] - U[:-1]) / dyg                                 # (Ny, C)
    Fu = Fu + pad_y(nu * (dU[1:] - dU[:-1]) / dyf)
    Fu = Fu + nu * (zp(U) - 2 * U + zm(U)) / dz ** 2
    Fu = Fu + dPdx / 2

    # ---- Fv
    Fv = -(xp(UV) - UV) / dx
    VV = (0.5 * (V[:-1] + V[1:])) ** 2                          # (Ny-1, C)
    Fv = Fv - pad_y((VV[1:] - VV[:-1]) / dym)
    VW = (0.5 * (V + zm(V))) * (0.5 * (W[:-1] + W[1:]))         # (Ny, C)
    Fv = Fv - (zp(VW) - VW) / dz
    Fv = Fv + nu * (xp(V) - 2 * V + xm(V)) / dx ** 2
    dV = (V[1:] - V[:-1]) / dyf                                 # (Ny-1, C)
    Fv = Fv + pad_y(nu * (dV[1:] - dV[:-1]) / dym)
    Fv = Fv + nu * (zp(V) - 2 * V + zm(V)) / dz ** 2

    # ---- Fw
    Fw = -(xp(UW) - UW) / dx
    Fw = Fw - pad_y((VW[1:] - VW[:-1]) / dyf)
    WW = (0.5 * (W + zp(W))) ** 2
    Fw = Fw - (WW - zm(WW)) / dz
    Fw = Fw + nu * (xp(W) - 2 * W + xm(W)) / dx ** 2
    dW = (W[1:] - W[:-1]) / dyg
    Fw = Fw + pad_y(nu * (dW[1:] - dW[:-1]) / dyf)
    Fw = Fw + nu * (zp(W) - 2 * W + zm(W)) / dz ** 2
    return Fu, Fv, Fw


def _apply_bc(U, V, W, op1, op2):
    """No-slip ghost rows for U/W, actuation rows for V (rows = y)."""
    U = jnp.concatenate([-U[1:2], U[1:-1], -U[-2:-1]], axis=0)
    W = jnp.concatenate([-W[1:2], W[1:-1], -W[-2:-1]], axis=0)
    V = jnp.concatenate([op1, V[1:-1], op2], axis=0)
    return U, V, W


def _div_k(U, V, W, dx, dz, dyf, sh):
    """Cell divergence (Ny-1, C) of kernel-layout fields."""
    xm, xp, zm, zp = sh
    Ui = U[1:-1]
    Wi = W[1:-1]
    return ((xp(Ui) - Ui) / dx + (V[1:] - V[:-1]) / dyf
            + (zp(Wi) - Wi) / dz)


# ---------------------------------------------------------------------------
# kernel A: RHS + RK update + BC + divergence (one substage, pre-solve)
# ---------------------------------------------------------------------------

def _substage_kernel(Nz, C, nu, dx, dz, c_cur, c_prev, out_f,
                     U_ref, V_ref, W_ref, U0_ref, V0_ref, W0_ref,
                     F1u_ref, F1v_ref, F1w_ref,
                     op1_ref, op2_ref, dPdx_ref, dt_ref,
                     dyf_ref, dyg_ref, dym_ref,
                     Un_ref, Vn_ref, Wn_ref, div_ref,
                     Fu_ref, Fv_ref, Fw_ref):
    sh = _shifts(Nz, C)
    dyf = dyf_ref[...]
    dyg = dyg_ref[...]
    dym = dym_ref[...]
    dPdx = dPdx_ref[0, 0]
    dt = dt_ref[0, 0]

    Fu, Fv, Fw = _rhs_terms(U_ref[...], V_ref[...], W_ref[...],
                            dPdx, nu, dx, dz, dyf, dyg, dym, sh)
    if out_f:
        Fu_ref[...] = Fu
        Fv_ref[...] = Fv
        Fw_ref[...] = Fw

    Un = U0_ref[...] + dt * c_cur * Fu
    Vn = V0_ref[...] + dt * c_cur * Fv
    Wn = W0_ref[...] + dt * c_cur * Fw
    if c_prev:
        Un = Un + dt * c_prev * F1u_ref[...]
        Vn = Vn + dt * c_prev * F1v_ref[...]
        Wn = Wn + dt * c_prev * F1w_ref[...]

    Un, Vn, Wn = _apply_bc(Un, Vn, Wn, op1_ref[...], op2_ref[...])
    Un_ref[...] = Un
    Vn_ref[...] = Vn
    Wn_ref[...] = Wn
    div_ref[...] = _div_k(Un, Vn, Wn, dx, dz, dyf, sh)


# ---------------------------------------------------------------------------
# kernel B: Poisson solve + pressure correction + BC (one substage, post)
# ---------------------------------------------------------------------------

def _bordered_eig_solve(dot, n, F2, A1_ref, B1_ref, denom1_ref,
                        g_ref, ss_ref, dlm, Pinv00_ref, s00_ref,
                        col, r):
    """(DD + kk I)^-1 r via the 128-row bordered eigenbasis (see
    ChannelGrid.schur_g docs): solve the leading m = n-1 block in its own
    eigenbasis (MXU-exact 128x128 contractions — the full n = 129 basis
    padded every contraction to 2 MXU tiles), recover the last row through
    the precomputed per-wavenumber Schur scalar, and override the (0,0)
    Neumann mode (columns 0 = re, F2/2 = im) with the regularized
    equilibrated Pinv00 solve.  r, return: (n, F2) with re|im columns."""
    m = n - 1
    F = F2 // 2
    y = dot(A1_ref[...], dot(B1_ref[...], r[:m]) / denom1_ref[...])
    P_last = (r[m:] - dlm * y[m - 1:m]) / ss_ref[...]
    P1 = y - g_ref[...] * P_last
    P = jnp.concatenate([P1, P_last], axis=0)
    # (0,0)-mode columns via lane-masked sums (layout-safe column gather)
    rc_re = jnp.sum(jnp.where(col == 0, r, 0.0), axis=1, keepdims=True)
    rc_im = jnp.sum(jnp.where(col == F, r, 0.0), axis=1, keepdims=True)
    rc = jnp.concatenate([rc_re, rc_im], axis=1)              # (n, 2)
    s00 = s00_ref[...]
    p00 = s00 * dot(Pinv00_ref[...], s00 * rc)                # (n, 2)
    P = jnp.where(col == 0, p00[:, 0:1], P)
    P = jnp.where(col == F, p00[:, 1:2], P)
    return P


def _solve_correct_body(dot, n, F, Nz, C, dx, dz, refine_steps,
                        Y, U, V, W, op1, op2,
                        T2_ref, Ti2_ref,
                        A1_ref, B1_ref, denom1_ref, g_ref, ss_ref,
                        kk_ref, Pinv00_ref, s00_ref,
                        dd_ref, dl_ref, du_ref, dd0h, dlm, dym):
    """Value-level Poisson solve of Y=(div) then U/V/W -= grad p on
    interior rows, then BC.  Shared by the per-substage kernel B and the
    whole-step fused kernel D.  re/im spectra ride side-by-side in one
    (n, 2F) array so every matmul runs once at double width (fewer MXU
    N-tiles wasted to padding: 2x(544->640) becomes 1088->1152)."""
    F2 = 2 * F
    t = dot(Y, T2_ref[...])                                   # (n, 2F)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, F2), 1)

    def eig_solve(r):
        return _bordered_eig_solve(dot, n, F2, A1_ref, B1_ref, denom1_ref,
                                   g_ref, ss_ref, dlm, Pinv00_ref, s00_ref,
                                   col, r)

    P = eig_solve(t)

    if refine_steps:
        kk = kk_ref[...]
        dd = dd_ref[...]
        dl = dl_ref[...]
        du = du_ref[...]
        row0 = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0) == 0
        mask0 = jnp.where((col == 0) | (col == F), 1.0, 0.0)
        m00 = jnp.where(row0, 1.0, 0.0) * mask0
        zrow = jnp.zeros((1, F2), jnp.float32)

        def tridiag(P):
            app = (dd + kk) * P
            app = app + dl * jnp.concatenate([zrow, P[:-1]], axis=0)
            app = app + du * jnp.concatenate([P[1:], zrow], axis=0)
            return app

        for _ in range(refine_steps):
            r = t - tridiag(P) - m00 * (dd0h * P)
            P = P + eig_solve(r)

    p = dot(P, Ti2_ref[...])                                  # (n, C)

    sh = _shifts(Nz, C)
    xm, _, zm, _ = sh
    Un = jnp.concatenate([U[:1], U[1:-1] - (p - xm(p)) / dx, U[-1:]], 0)
    Vn = jnp.concatenate([V[:1], V[1:-1] - (p[1:] - p[:-1]) / dym, V[-1:]],
                         0)
    Wn = jnp.concatenate([W[:1], W[1:-1] - (p - zm(p)) / dz, W[-1:]], 0)
    return _apply_bc(Un, Vn, Wn, op1, op2)


def _solve_correct_kernel(n, F, Nz, C, dx, dz, refine_steps,
                          Y_ref, U_ref, V_ref, W_ref,
                          op1_ref, op2_ref,
                          T2_ref, Ti2_ref,
                          A1_ref, B1_ref, denom1_ref, g_ref, ss_ref,
                          kk_ref,
                          Pinv00_ref, s00_ref,
                          dd_ref, dl_ref, du_ref, dd0h_ref, dlm_ref,
                          dym_ref,
                          Un_ref, Vn_ref, Wn_ref):
    """Ref wrapper of `_solve_correct_body` (kernel B)."""

    def dot(a, b):
        return jax.lax.dot(a, b, precision=_HP,
                           preferred_element_type=jnp.float32)

    Un, Vn, Wn = _solve_correct_body(
        dot, n, F, Nz, C, dx, dz, refine_steps,
        Y_ref[...], U_ref[...], V_ref[...], W_ref[...],
        op1_ref[...], op2_ref[...],
        T2_ref, Ti2_ref, A1_ref, B1_ref, denom1_ref, g_ref, ss_ref,
        kk_ref, Pinv00_ref, s00_ref, dd_ref, dl_ref, du_ref,
        dd0h_ref[0, 0], dlm_ref[0, 0], dym_ref[...])
    Un_ref[...] = Un
    Vn_ref[...] = Vn
    Wn_ref[...] = Wn


# ---------------------------------------------------------------------------
# kernel C: boundary pressures (pressure RHS + 4-row spectral synthesis)
# ---------------------------------------------------------------------------

def _boundary_fwd_kernel(n, F, Nz, C, nu, dx, dz,
                         U_ref, V_ref, W_ref, dPdx_ref,
                         dyf_ref, dyg_ref, dym_ref,
                         T2_ref,
                         t_ref):
    """First half of `_boundary_kernel`: pressure RHS from the state plus
    the forward (x,z) DFT -> t (n, 2F) re|im.  Split from the solve half
    so neither pallas_call stages both Kronecker transform matrices at
    once (the combined kernel's operand stack overruns the 16 MB scoped-
    VMEM budget on v5e inside a collecting scan)."""
    sh = _shifts(Nz, C)
    dyf = dyf_ref[...]
    Fu, Fv, Fw = _rhs_terms(U_ref[...], V_ref[...], W_ref[...],
                            dPdx_ref[0, 0], nu, dx, dz,
                            dyf, dyg_ref[...], dym_ref[...], sh)
    xm, xp, zm, zp = sh
    rhs = ((xp(Fu[1:-1]) - Fu[1:-1]) / dx + (Fv[1:] - Fv[:-1]) / dyf
           + (zp(Fw[1:-1]) - Fw[1:-1]) / dz)                 # (n, C)

    def dot(a, b):
        return jax.lax.dot(a, b, precision=_HP,
                           preferred_element_type=jnp.float32)

    t_ref[...] = dot(rhs, T2_ref[...])


def _boundary_solve_body(dot, n, F, t,
                         Ti24_ref, A13_ref, B1_ref, denom1_ref,
                         g3_ref, ss_ref, dlm,
                         Pinv00_ref, s00_ref):
    """Bordered eigen-solve of the transformed RHS t (n, 2F) restricted to
    the 4 boundary rows [0, 1, n-2, n-1] + inverse synthesis -> (2, C).
    Row n-2 = m-1 comes from the block solve (A13 = A1 rows [0,1,m-1]);
    row n-1 is the Schur-recovered last row."""
    m = n - 1
    F2 = 2 * F
    col = jax.lax.broadcasted_iota(jnp.int32, (1, F2), 1)
    u = dot(B1_ref[...], t[:m]) / denom1_ref[...]            # (m, 2F)
    y3 = dot(A13_ref[...], u)                                # (3, 2F)
    P_last = (t[m:] - dlm * y3[2:3]) / ss_ref[...]           # (1, 2F)
    P13 = y3 - g3_ref[...] * P_last                          # (3, 2F)
    P4 = jnp.concatenate([P13, P_last], axis=0)  # rows 0,1,n-2,n-1
    # regularized (0,0) mode (real column 0; imag column F is zeroed):
    # the row gather is done with slices (Mosaic-safe): rows [0,1] and
    # [n-2, n-1] of the full (n, 1) solve
    rc0 = jnp.sum(jnp.where(col == 0, t, 0.0), axis=1, keepdims=True)
    s00 = s00_ref[...]                                       # (n, 1)
    full00 = s00 * dot(Pinv00_ref[...], s00 * rc0)           # (n, 1)
    p00_4 = jnp.concatenate([full00[0:2], full00[n - 2:n]], axis=0)  # (4,1)
    P4 = jnp.where(col == 0, p00_4, P4)
    P4 = jnp.where(col == F, 0.0, P4)
    P4 = dot(P4, Ti24_ref[...])                              # (4, C)
    p1 = -0.5 * (P4[0:1] + P4[1:2])
    p2 = -0.5 * (P4[3:4] + P4[2:3])
    return jnp.concatenate([p1, p2], axis=0)


def _boundary_solve_kernel(n, F,
                           t_ref, Ti24_ref,
                           A13_ref, B1_ref, denom1_ref,
                           g3_ref, ss_ref, dlm_ref,
                           Pinv00_ref, s00_ref,
                           p_ref):
    """Second half: bordered eigen-solve on the 4 boundary rows + inverse
    synthesis -> p_ref (2, C) = (p1, p2)."""

    def dot(a, b):
        return jax.lax.dot(a, b, precision=_HP,
                           preferred_element_type=jnp.float32)

    p_ref[...] = _boundary_solve_body(
        dot, n, F, t_ref[...], Ti24_ref, A13_ref, B1_ref, denom1_ref,
        g3_ref, ss_ref, dlm_ref[0, 0], Pinv00_ref, s00_ref)


def _boundary_kernel(n, F, Nz, C, nu, dx, dz,
                     U_ref, V_ref, W_ref, dPdx_ref,
                     dyf_ref, dyg_ref, dym_ref,
                     T2_ref, Ti24_ref,
                     A13_ref, B1_ref, denom1_ref,
                     g3_ref, ss_ref, dlm_ref,
                     Pinv00_ref, s00_ref,
                     p_ref):
    """p_ref (2, C): rows = (p1, p2) = -0.5*(P rows 0+1), -0.5*(rows
    n-1 + n-2) — channel_flow.boundary_pressures' fast path with the
    4-row eigenvector slice baked into A13/Ti24."""
    sh = _shifts(Nz, C)
    dyf = dyf_ref[...]
    Fu, Fv, Fw = _rhs_terms(U_ref[...], V_ref[...], W_ref[...],
                            dPdx_ref[0, 0], nu, dx, dz,
                            dyf, dyg_ref[...], dym_ref[...], sh)
    xm, xp, zm, zp = sh
    rhs = ((xp(Fu[1:-1]) - Fu[1:-1]) / dx + (Fv[1:] - Fv[:-1]) / dyf
           + (zp(Fw[1:-1]) - Fw[1:-1]) / dz)                 # (n, C)

    def dot(a, b):
        return jax.lax.dot(a, b, precision=_HP,
                           preferred_element_type=jnp.float32)

    t = dot(rhs, T2_ref[...])                                # (n, 2F)
    p_ref[...] = _boundary_solve_body(
        dot, n, F, t, Ti24_ref, A13_ref, B1_ref, denom1_ref,
        g3_ref, ss_ref, dlm_ref[0, 0], Pinv00_ref, s00_ref)


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------

def _row_consts(grid):
    """(rows, 1) f32 y-metric columns used by every kernel."""
    f32 = jnp.float32
    y = grid.y.astype(f32)
    ym = grid.ym.astype(f32)
    yg = grid.yg.astype(f32)
    dyf = (y[1:] - y[:-1]).reshape(-1, 1)      # (Ny-1, 1)
    dyg = (yg[1:] - yg[:-1]).reshape(-1, 1)    # (Ny,   1)
    dym = (ym[1:] - ym[:-1]).reshape(-1, 1)    # (Ny-2, 1)
    return dyf, dyg, dym


def _solve_consts(grid):
    """Solve-kernel constants in the fused re|im layout: every (*, F)
    per-wavenumber vector is doubled to (*, 2F) so one matmul/elementwise
    pass covers both spectrum components."""
    f32 = jnp.float32
    Nzr = grid.Nz // 2 + 1
    F = grid.Nx * Nzr
    n = grid.Ny - 1
    kxx = grid.kxx.astype(f32)
    kzz = grid.kzz.astype(f32)[:Nzr]
    kk = (kxx[:, None] + kzz[None, :]).reshape(1, F)
    denom1 = grid.eig_lam1.astype(f32)[:, None] + kk        # (n-1, F)
    denom1 = jnp.where(jnp.abs(denom1) < 1e-12, 1.0, denom1)
    double = lambda a: jnp.concatenate([a, a], axis=1)
    kk2 = double(kk)
    denom1_2 = double(denom1)
    g2 = double(grid.schur_g.astype(f32))
    ss2 = double(grid.schur_s.astype(f32).reshape(1, F))
    dlm = grid.DD_lower.astype(f32)[n - 2:].reshape(1, 1)
    dl = jnp.concatenate([jnp.zeros((1,), f32),
                          grid.DD_lower.astype(f32)]).reshape(n, 1)
    du = jnp.concatenate([grid.DD_upper.astype(f32),
                          jnp.zeros((1,), f32)]).reshape(n, 1)
    dd0h = (0.5 * grid.DD_diag[:1].astype(f32)).reshape(1, 1)
    return kk2, denom1_2, g2, ss2, dlm, dl, du, dd0h


def _kron_mats2(Nx, Nz):
    """Forward/inverse Kronecker DFT matrices in the fused re|im layout:
    T2 = [TR | TI] (C, 2F), Ti2 = [TiR ; -TiI] (2F, C), so the forward
    transform and the real-part inverse synthesis are ONE matmul each."""
    TR, TI, TiR, TiI = _kron_mats(Nx, Nz)
    T2 = np.concatenate([np.asarray(TR), np.asarray(TI)], axis=1)
    Ti2 = np.concatenate([np.asarray(TiR), -np.asarray(TiI)], axis=0)
    return T2, Ti2


_RK3_STAGES = ((8 / 15, 0.0), (5 / 12, 1 / 4), (3 / 4, 1 / 4))
# (c_cur, c_prev-on-F1): channel_flow.rk3_step's coefficient triples
# [8/15], [1/4, 5/12], [1/4, 0, 3/4] collapse to (current, F1) pairs.


def _substage_call(grid, U, V, W, U0, V0, W0, F1, op1, op2, dPdx,
                   c_cur, c_prev, out_f, interpret=False):
    interpret = interpret or INTERPRET
    Nx, Ny, Nz = grid.Nx, grid.Ny, grid.Nz
    C = Nx * Nz
    f32 = jnp.float32
    dyf, dyg, dym = _row_consts(grid)
    kernel = partial(_substage_kernel, Nz, C, grid.nu, grid.dx, grid.dz,
                     c_cur, c_prev, out_f)
    shp = lambda r: jax.ShapeDtypeStruct((r, C), f32)
    out_shape = (shp(Ny + 1), shp(Ny), shp(Ny + 1), shp(Ny - 1),
                 shp(Ny + 1), shp(Ny), shp(Ny + 1))
    F1u, F1v, F1w = F1
    return pl.pallas_call(kernel, out_shape=out_shape,
                          interpret=interpret)(
        U, V, W, U0, V0, W0, F1u, F1v, F1w, op1, op2,
        jnp.reshape(dPdx.astype(f32), (1, 1)),
        jnp.full((1, 1), grid.dt, f32), dyf, dyg, dym)


def _solve_correct_call(grid, div, U, V, W, op1, op2, interpret=False):
    interpret = interpret or INTERPRET
    Nx, Ny, Nz = grid.Nx, grid.Ny, grid.Nz
    C = Nx * Nz
    n = Ny - 1
    Nzr = Nz // 2 + 1
    F = Nx * Nzr
    f32 = jnp.float32
    T2, Ti2 = _kron_mats2(Nx, Nz)
    kk2, denom1_2, g2, ss2, dlm, dl, du, dd0h = _solve_consts(grid)
    _, _, dym = _row_consts(grid)
    kernel = partial(_solve_correct_kernel, n, F, Nz, C, grid.dx, grid.dz,
                     grid.refine_steps)
    shp = lambda r: jax.ShapeDtypeStruct((r, C), f32)
    # Raised scoped-VMEM budget: the kernel's operand stack (both 4.5 MB
    # Kronecker transforms + solve constants + 3 state fields) sits right
    # at the 16 MB default — it fits in a bare control chunk but hits
    # 17.7 MB when the surrounding graph forces unshared operand copies
    # (observed compiling the adaptive-policy chunk: AOT 'out of memory in
    # memory space vmem', drag_study optimal-policy-observer row).  v5e
    # has 128 MB physical VMEM; same knob as _BATCH_PARAMS.
    return pl.pallas_call(kernel, out_shape=(shp(Ny + 1), shp(Ny),
                                             shp(Ny + 1)),
                          compiler_params=pltpu.CompilerParams(
                              vmem_limit_bytes=32 * 1024 * 1024),
                          interpret=interpret)(
        div, U, V, W, op1, op2,
        jnp.asarray(T2), jnp.asarray(Ti2),
        grid.eig_A1.astype(f32), grid.eig_B1.astype(f32),
        denom1_2, g2, ss2, kk2, grid.Pinv00_eq.astype(f32),
        grid.s00.astype(f32).reshape(n, 1),
        grid.DD_diag.astype(f32).reshape(n, 1), dl, du, dd0h, dlm, dym)


def rk3_step_k(grid, U, V, W, dPdx, meanU0, op1, op2, interpret=False):
    """Full RK3 step on kernel-layout state.  op1/op2: (1, C) actuation
    rows.  Returns (U, V, W, dPdx')."""
    U0, V0, W0 = U, V, W
    zero = jnp.zeros_like(U)
    F1 = (zero, jnp.zeros_like(V), jnp.zeros_like(W))
    for i, (c_cur, c_prev) in enumerate(_RK3_STAGES):
        Un, Vn, Wn, div, Fu, Fv, Fw = _substage_call(
            grid, U, V, W, U0, V0, W0, F1, op1, op2, dPdx,
            c_cur, c_prev, out_f=(i == 0), interpret=interpret)
        if i == 0:
            F1 = (Fu, Fv, Fw)
        U, V, W = _solve_correct_call(grid, div, Un, Vn, Wn, op1, op2,
                                      interpret=interpret)

    # mass-flow correction (channel_flow.rk3_step:590-594): row means +
    # trapezoid — scalar XLA work on the kernel layout
    profile = jnp.mean(U[1:-1], axis=1)
    zero1 = jnp.zeros((1,), U.dtype)
    vals = jnp.concatenate([zero1, profile, zero1])
    ys = jnp.concatenate([zero1, grid.ym.astype(U.dtype),
                          jnp.full((1,), 2.0, U.dtype)])
    meanU_now = jnp.trapezoid(vals, ys) / 2.0
    d_new = 2.0 * (meanU0 - meanU_now)
    U = U.at[1:-1].add(d_new / 2.0)
    dPdx_out = 0.5 * (dPdx + d_new / grid.dt)
    return U, V, W, dPdx_out


def _boundary_consts(grid):
    """(A13, g3_2): the 3 block-solve rows [0, 1, m-1] of the bordered
    eigenbasis / Schur coupling needed for boundary synthesis."""
    f32 = jnp.float32
    m = grid.Ny - 2
    rows = np.asarray([0, 1, m - 1])
    A13 = grid.eig_A1[rows].astype(f32)
    g3 = grid.schur_g[rows].astype(f32)
    return A13, jnp.concatenate([g3, g3], axis=1)


def boundary_pressures_k(grid, U, V, W, dPdx, interpret=False):
    """(p1, p2) rows (each (1, C)) from kernel-layout state."""
    interpret = interpret or INTERPRET
    Nx, Ny, Nz = grid.Nx, grid.Ny, grid.Nz
    C = Nx * Nz
    n = Ny - 1
    Nzr = Nz // 2 + 1
    F = Nx * Nzr
    f32 = jnp.float32
    T2, Ti2 = _kron_mats2(Nx, Nz)
    _, denom1_2, _, ss2, dlm, _, _, _ = _solve_consts(grid)
    A13, g3_2 = _boundary_consts(grid)
    dyf, dyg, dym = _row_consts(grid)
    fwd = partial(_boundary_fwd_kernel, n, F, Nz, C, grid.nu, grid.dx,
                  grid.dz)
    t = pl.pallas_call(
        fwd, out_shape=jax.ShapeDtypeStruct((n, 2 * F), f32),
        interpret=interpret)(
        U, V, W, jnp.reshape(dPdx.astype(f32), (1, 1)),
        dyf, dyg, dym, jnp.asarray(T2))
    solve = partial(_boundary_solve_kernel, n, F)
    p = pl.pallas_call(
        solve, out_shape=jax.ShapeDtypeStruct((2, C), f32),
        interpret=interpret)(
        t, jnp.asarray(Ti2), A13, grid.eig_B1.astype(f32), denom1_2,
        g3_2, ss2, dlm,
        grid.Pinv00_eq.astype(f32), grid.s00.astype(f32).reshape(n, 1))
    return p[0:1], p[1:2]


# ---------------------------------------------------------------------------
# ChannelState-level entry points (with layout conversion + XLA-path VJPs)
# ---------------------------------------------------------------------------

@jax.custom_vjp
def rk3_step_fused(grid, state, opV1, opV2):
    """Drop-in fused `channel_flow.rk3_step` (TPU, f32, unbatched).

    Numerics match the XLA path to f32 roundoff (see
    tests/test_rk3_fused.py); gradients delegate to the XLA
    implementation."""
    return _rk3_step_fused_impl(grid, state, opV1, opV2)


def _rk3_step_fused_impl(grid, state, opV1, opV2, interpret=False):
    C = grid.Nx * grid.Nz
    f32 = jnp.float32
    U, V, W = state_to_k(state)
    op1 = jnp.reshape(opV1.astype(f32), (1, C))
    op2 = jnp.reshape(opV2.astype(f32), (1, C))
    U, V, W, dPdx = rk3_step_k(grid, U.astype(f32), V.astype(f32),
                               W.astype(f32), state.dPdx, state.meanU0,
                               op1, op2, interpret=interpret)
    return state.replace(U=from_k(U, grid.Nx, grid.Nz),
                         V=from_k(V, grid.Nx, grid.Nz),
                         W=from_k(W, grid.Nx, grid.Nz),
                         dPdx=dPdx)


def _rk3_fwd(grid, state, opV1, opV2):
    return _rk3_step_fused_impl(grid, state, opV1, opV2), \
        (grid, state, opV1, opV2)


def _rk3_bwd(res, g):
    from . import channel_flow as cf
    grid, state, opV1, opV2 = res
    _, vjp = jax.vjp(
        lambda s, o1, o2: cf._rk3_step_unfused(grid, s, o1, o2),
        state, opV1, opV2)
    ds, d1, d2 = vjp(g)
    zero_grid = jax.tree.map(jnp.zeros_like, grid)
    return zero_grid, ds, d1, d2


rk3_step_fused.defvjp(_rk3_fwd, _rk3_bwd)


@jax.custom_vjp
def boundary_pressures_fused(grid, state):
    """Drop-in fused `channel_flow.boundary_pressures` (TPU, f32,
    unbatched)."""
    return _boundary_fused_impl(grid, state)


def _boundary_fused_impl(grid, state, interpret=False):
    f32 = jnp.float32
    U, V, W = state_to_k(state)
    p1, p2 = boundary_pressures_k(grid, U.astype(f32), V.astype(f32),
                                  W.astype(f32), state.dPdx,
                                  interpret=interpret)
    return (p1.reshape(grid.Nx, grid.Nz), p2.reshape(grid.Nx, grid.Nz))


def _bp_fwd(grid, state):
    return _boundary_fused_impl(grid, state), (grid, state)


def _bp_bwd(res, g):
    from . import channel_flow as cf
    grid, state = res
    _, vjp = jax.vjp(
        lambda s: cf._boundary_pressures_unfused(grid, s), state)
    (ds,) = vjp(g)
    zero_grid = jax.tree.map(jnp.zeros_like, grid)
    return zero_grid, ds


boundary_pressures_fused.defvjp(_bp_fwd, _bp_bwd)


# ---------------------------------------------------------------------------
# kernel-layout scan support: metrics + env step with NO layout flips
# (the bench regression without this: per-step transposes around the
# kernels collapse the closed loop to ~240 steps/s — the same failure
# mode as round 2's piecewise fusion)
# ---------------------------------------------------------------------------

def _xla_shifts(Nz, C):
    """XLA (non-pallas) lane shifts on (rows, C) arrays for the cheap
    once-per-step metric math."""
    col = (jnp.arange(C) % Nz)[None, :]

    def xp(a):
        return jnp.roll(a, -Nz, axis=1)

    def xm(a):
        return jnp.roll(a, Nz, axis=1)

    def zp(a):
        return jnp.where(col == Nz - 1, jnp.roll(a, Nz - 1, axis=1),
                         jnp.roll(a, -1, axis=1))

    def zm(a):
        return jnp.where(col == 0, jnp.roll(a, 1 - Nz, axis=1),
                         jnp.roll(a, 1, axis=1))

    return xm, xp, zm, zp


def divergence_k(grid, U, V, W):
    """channel_flow.divergence on kernel-layout fields (XLA)."""
    C = grid.Nx * grid.Nz
    xm, xp, zm, zp = _xla_shifts(grid.Nz, C)
    dyf, _, _ = _row_consts(grid)
    Ui = U[1:-1]
    Wi = W[1:-1]
    return ((xp(Ui) - Ui) / grid.dx + (V[1:] - V[:-1]) / dyf.astype(U.dtype)
            + (zp(Wi) - Wi) / grid.dz)


def mean_u_k(grid, U):
    """channel_flow.calculate_mean_u on a kernel-layout U."""
    profile = jnp.mean(U[1:-1], axis=1)
    zero1 = jnp.zeros((1,), U.dtype)
    vals = jnp.concatenate([zero1, profile, zero1])
    ys = jnp.concatenate([zero1, grid.ym.astype(U.dtype),
                          jnp.full((1,), 2.0, U.dtype)])
    return jnp.trapezoid(vals, ys) / 2.0


def step_metrics_k(grid, state, p2):
    """channel_flow.step_metrics with kernel-layout state leaves; p2 is
    (Nx, Nz) as observed by the policies."""
    from . import channel_flow as cf
    U, V, W = state.U, state.V, state.W
    dudy = (U[-1] - U[-2]) / (grid.y[-1] - grid.y[-2])
    shear = jnp.abs(jnp.mean(-U[-1] * V[-1] + grid.nu * dudy))
    div = divergence_k(grid, U, V, W)
    return {
        "drag_reduction/1_shear_stress": shear,
        "drag_reduction/2_1_mass_flow": mean_u_k(grid, U),
        "drag_reduction/2_2_v_velocity": jnp.mean(jnp.abs(V)),
        "drag_reduction/2_3_w_velocity": jnp.mean(jnp.abs(W)),
        "drag_reduction/3_1_pressure_mean": jnp.mean(p2),
        "drag_reduction/3_2_dPdx_finite_difference":
            cf.dpdx_finite_difference(grid, p2),
        "drag_reduction/3_3_dPdx_reverse_cal": state.dPdx,
        "drag_reduction/4_1_-|divergence|":
            jnp.maximum(-jnp.abs(jnp.sum(div)), -100.0),
        "drag_reduction/4_4_speed_norm":
            jnp.linalg.norm(U) + jnp.linalg.norm(V) + jnp.linalg.norm(W),
    }


def state_to_kstate(state):
    """ChannelState (x,y,z) -> ChannelState with kernel-layout (rows=y,
    cols=x*Nz+z) 2-D leaves.  `channel_flow.gt_control` and the policy
    zoo handle both layouts; only use inside the fused scan paths."""
    U, V, W = state_to_k(state)
    f32 = jnp.float32
    return state.replace(U=U.astype(f32), V=V.astype(f32),
                         W=W.astype(f32),
                         dPdx=state.dPdx.astype(f32),
                         meanU0=state.meanU0.astype(f32))


def kstate_to_state(grid, kstate, dtype=None):
    dtype = dtype or kstate.U.dtype
    return kstate.replace(
        U=from_k(kstate.U, grid.Nx, grid.Nz).astype(dtype),
        V=from_k(kstate.V, grid.Nx, grid.Nz).astype(dtype),
        W=from_k(kstate.W, grid.Nx, grid.Nz).astype(dtype))


def env_step_k(grid, kstate, opV1, opV2):
    """Fused env step on a kernel-layout ChannelState: advance + boundary
    pressures + scoreboard (channel_flow.env_step equivalent).  opV1/opV2
    arrive (Nx, Nz) from the policies."""
    if FULLSTEP:
        return env_step_full_k(grid, kstate, opV1, opV2)
    C = grid.Nx * grid.Nz
    f32 = jnp.float32
    op1 = jnp.reshape(opV1.astype(f32), (1, C))
    op2 = jnp.reshape(opV2.astype(f32), (1, C))
    U, V, W, dPdx = rk3_step_k(grid, kstate.U, kstate.V, kstate.W,
                               kstate.dPdx, kstate.meanU0, op1, op2)
    kstate = kstate.replace(U=U, V=V, W=W, dPdx=dPdx)
    p1, p2 = boundary_pressures_k(grid, U, V, W, dPdx)
    p2 = p2.reshape(grid.Nx, grid.Nz)
    info = step_metrics_k(grid, kstate, p2)
    return kstate, p2, info


# ---------------------------------------------------------------------------
# batched (multi-env) kernels: grid=(B,) over envs, state packed (rows,
# B*C) env-major so each program sees one env's (rows, C) block and the
# kernel BODIES above are reused verbatim.  One pallas_call per kernel per
# substage amortizes the 7-dispatch/step cost across all B envs — the
# single-chip data-collection multiplier (VERDICT r2 item 4: vmapped
# batching cost 8.1x single-env per step at B=8; this path targets the
# dispatch-bound regime directly).  Shared operands (eigen matrices, y
# metrics) use constant index_maps, so Mosaic keeps them VMEM-resident
# across grid steps.  Non-differentiable (rollout/data collection only);
# training paths use the XLA implementation.
# ---------------------------------------------------------------------------

def batch_states(states):
    """Batched ChannelState (B, Nx, R, Nz) leaves -> packed kernel layout
    (R, B*Nx*Nz), cols = b*(Nx*Nz) + x*Nz + z (env-major)."""
    def pack(a):
        B, Nx, R, Nz = a.shape
        return jnp.transpose(a, (2, 0, 1, 3)).reshape(R, B * Nx * Nz)
    f32 = jnp.float32
    return states.replace(
        U=pack(states.U).astype(f32), V=pack(states.V).astype(f32),
        W=pack(states.W).astype(f32),
        dPdx=jnp.reshape(states.dPdx, (-1,)).astype(f32),
        meanU0=jnp.reshape(states.meanU0, (-1,)).astype(f32))


def unbatch_states(grid, kstates, B, dtype=None):
    """Inverse of `batch_states`."""
    Nx, Nz = grid.Nx, grid.Nz

    def unpack(a):
        R = a.shape[0]
        return jnp.transpose(a.reshape(R, B, Nx, Nz), (1, 2, 0, 3))
    dtype = dtype or kstates.U.dtype
    return kstates.replace(U=unpack(kstates.U).astype(dtype),
                           V=unpack(kstates.V).astype(dtype),
                           W=unpack(kstates.W).astype(dtype))


# envs are independent grid steps; double-buffered block pipelines push
# the substage kernel past the default 16M scoped-VMEM budget at any B,
# so the batched calls raise the limit (v5e has 128M VMEM).
_BATCH_PARAMS = pltpu.CompilerParams(
    vmem_limit_bytes=96 * 1024 * 1024,
    dimension_semantics=("parallel",))


def _bspec(rows, C):
    """Per-env block: (rows, C) columns at env index b."""
    return pl.BlockSpec((rows, C), lambda b: (0, b))


def _shared(shape):
    """Whole-array block, same for every env program."""
    return pl.BlockSpec(shape, lambda b: (0, 0))


def _substage_call_b(grid, B, U, V, W, U0, V0, W0, F1, op1, op2, dPdx,
                     c_cur, c_prev, out_f, interpret=False):
    interpret = interpret or INTERPRET
    Nx, Ny, Nz = grid.Nx, grid.Ny, grid.Nz
    C = Nx * Nz
    f32 = jnp.float32
    dyf, dyg, dym = _row_consts(grid)
    kernel = partial(_substage_kernel, Nz, C, grid.nu, grid.dx, grid.dz,
                     c_cur, c_prev, out_f)
    shp = lambda r: jax.ShapeDtypeStruct((r, B * C), f32)
    out_shape = (shp(Ny + 1), shp(Ny), shp(Ny + 1), shp(Ny - 1),
                 shp(Ny + 1), shp(Ny), shp(Ny + 1))
    out_specs = (_bspec(Ny + 1, C), _bspec(Ny, C), _bspec(Ny + 1, C),
                 _bspec(Ny - 1, C), _bspec(Ny + 1, C), _bspec(Ny, C),
                 _bspec(Ny + 1, C))
    in_specs = [
        _bspec(Ny + 1, C), _bspec(Ny, C), _bspec(Ny + 1, C),   # U V W
        _bspec(Ny + 1, C), _bspec(Ny, C), _bspec(Ny + 1, C),   # U0 V0 W0
        _bspec(Ny + 1, C), _bspec(Ny, C), _bspec(Ny + 1, C),   # F1
        _bspec(1, C), _bspec(1, C),                            # op1 op2
        # per-env scalars ride as (1, B*C) broadcast rows: Mosaic requires
        # lane-aligned blocks, so a (1,1) block of a (1,B) array is
        # rejected; the kernel body reads [0, 0] of its (1, C) block
        _bspec(1, C),                                          # dPdx
        _shared((1, 1)),                                       # dt
        _shared((Ny - 1, 1)), _shared((Ny, 1)), _shared((Ny - 2, 1)),
    ]
    F1u, F1v, F1w = F1
    return pl.pallas_call(kernel, out_shape=out_shape, grid=(B,),
                          in_specs=in_specs, out_specs=out_specs,
                          compiler_params=_BATCH_PARAMS,
                          interpret=interpret)(
        U, V, W, U0, V0, W0, F1u, F1v, F1w, op1, op2,
        jnp.repeat(dPdx.astype(f32), C)[None, :],
        jnp.full((1, 1), grid.dt, f32), dyf, dyg, dym)


def _solve_correct_call_b(grid, B, div, U, V, W, op1, op2,
                          interpret=False):
    interpret = interpret or INTERPRET
    Nx, Ny, Nz = grid.Nx, grid.Ny, grid.Nz
    C = Nx * Nz
    n = Ny - 1
    Nzr = Nz // 2 + 1
    F = Nx * Nzr
    f32 = jnp.float32
    m = n - 1
    T2, Ti2 = _kron_mats2(Nx, Nz)
    kk2, denom1_2, g2, ss2, dlm, dl, du, dd0h = _solve_consts(grid)
    _, _, dym = _row_consts(grid)
    kernel = partial(_solve_correct_kernel, n, F, Nz, C, grid.dx, grid.dz,
                     grid.refine_steps)
    shp = lambda r: jax.ShapeDtypeStruct((r, B * C), f32)
    F2 = 2 * F
    in_specs = [
        _bspec(n, C),                                          # div
        _bspec(Ny + 1, C), _bspec(Ny, C), _bspec(Ny + 1, C),   # U V W
        _bspec(1, C), _bspec(1, C),                            # op1 op2
        _shared((C, F2)), _shared((F2, C)),                    # T2 Ti2
        _shared((m, m)), _shared((m, m)),                      # A1 B1
        _shared((m, F2)), _shared((m, F2)),                    # denom1 g
        _shared((1, F2)), _shared((1, F2)),                    # ss kk
        _shared((n, n)), _shared((n, 1)),                      # Pinv00 s00
        _shared((n, 1)), _shared((n, 1)), _shared((n, 1)),     # dd dl du
        _shared((1, 1)), _shared((1, 1)),                      # dd0h dlm
        _shared((n - 1, 1)),                                   # dym
    ]
    return pl.pallas_call(kernel, out_shape=(shp(Ny + 1), shp(Ny),
                                             shp(Ny + 1)),
                          grid=(B,), in_specs=in_specs,
                          out_specs=(_bspec(Ny + 1, C), _bspec(Ny, C),
                                     _bspec(Ny + 1, C)),
                          compiler_params=_BATCH_PARAMS,
                          interpret=interpret)(
        div, U, V, W, op1, op2,
        jnp.asarray(T2), jnp.asarray(Ti2),
        grid.eig_A1.astype(f32), grid.eig_B1.astype(f32),
        denom1_2, g2, ss2, kk2, grid.Pinv00_eq.astype(f32),
        grid.s00.astype(f32).reshape(n, 1),
        grid.DD_diag.astype(f32).reshape(n, 1), dl, du, dd0h, dlm, dym)


def rk3_step_kb(grid, B, U, V, W, dPdx, meanU0, op1, op2, interpret=False):
    """Full RK3 step on packed batched kernel-layout state.

    U/W: (Ny+1, B*C), V: (Ny, B*C), dPdx/meanU0: (B,), op1/op2: (1, B*C).
    Returns (U, V, W, dPdx')."""
    C = grid.Nx * grid.Nz
    U0, V0, W0 = U, V, W
    zero = jnp.zeros_like(U)
    F1 = (zero, jnp.zeros_like(V), jnp.zeros_like(W))
    for i, (c_cur, c_prev) in enumerate(_RK3_STAGES):
        Un, Vn, Wn, div, Fu, Fv, Fw = _substage_call_b(
            grid, B, U, V, W, U0, V0, W0, F1, op1, op2, dPdx,
            c_cur, c_prev, out_f=(i == 0), interpret=interpret)
        if i == 0:
            F1 = (Fu, Fv, Fw)
        U, V, W = _solve_correct_call_b(grid, B, div, Un, Vn, Wn, op1, op2,
                                        interpret=interpret)

    # per-env mass-flow correction (cf. rk3_step_k)
    R = U.shape[0]
    profile = jnp.mean(U[1:-1].reshape(R - 2, B, C), axis=2)   # (Ny-1, B)
    zeroB = jnp.zeros((1, B), U.dtype)
    vals = jnp.concatenate([zeroB, profile, zeroB], axis=0)
    ys = jnp.concatenate([jnp.zeros((1,), U.dtype),
                          grid.ym.astype(U.dtype),
                          jnp.full((1,), 2.0, U.dtype)])
    meanU_now = jnp.trapezoid(vals, ys, axis=0) / 2.0          # (B,)
    d_new = 2.0 * (meanU0 - meanU_now)
    U = U.at[1:-1].add(jnp.repeat(d_new, C)[None, :] / 2.0)
    dPdx_out = 0.5 * (dPdx + d_new / grid.dt)
    return U, V, W, dPdx_out


def boundary_pressures_kb(grid, B, U, V, W, dPdx, interpret=False):
    """(p1, p2) rows (each (1, B*C)) from packed batched state."""
    interpret = interpret or INTERPRET
    Nx, Ny, Nz = grid.Nx, grid.Ny, grid.Nz
    C = Nx * Nz
    n = Ny - 1
    Nzr = Nz // 2 + 1
    F = Nx * Nzr
    f32 = jnp.float32
    m = n - 1
    T2, Ti2 = _kron_mats2(Nx, Nz)
    _, denom1_2, _, ss2, dlm, _, _, _ = _solve_consts(grid)
    A13, g3_2 = _boundary_consts(grid)
    dyf, dyg, dym = _row_consts(grid)
    kernel = partial(_boundary_kernel, n, F, Nz, C, grid.nu, grid.dx,
                     grid.dz)
    F2 = 2 * F
    in_specs = [
        _bspec(Ny + 1, C), _bspec(Ny, C), _bspec(Ny + 1, C),
        _bspec(1, C),                                          # dPdx row
        _shared((Ny - 1, 1)), _shared((Ny, 1)), _shared((Ny - 2, 1)),
        _shared((C, F2)), _shared((F2, C)),                    # T2 Ti2
        _shared((3, m)), _shared((m, m)), _shared((m, F2)),    # A13 B1 den
        _shared((3, F2)), _shared((1, F2)), _shared((1, 1)),   # g3 ss dlm
        _shared((n, n)), _shared((n, 1)),                      # Pinv00 s00
    ]
    p = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((2, B * C), f32),
        grid=(B,), in_specs=in_specs, out_specs=_bspec(2, C),
        compiler_params=_BATCH_PARAMS,
        interpret=interpret)(
        U, V, W, jnp.repeat(dPdx.astype(f32), C)[None, :],
        dyf, dyg, dym,
        jnp.asarray(T2), jnp.asarray(Ti2),
        A13, grid.eig_B1.astype(f32), denom1_2, g3_2, ss2, dlm,
        grid.Pinv00_eq.astype(f32), grid.s00.astype(f32).reshape(n, 1))
    return p[0:1], p[1:2]


# ---------------------------------------------------------------------------
# kernel D: the WHOLE env step in one pallas dispatch — 3x(RHS + RK update
# + BC + divergence + Poisson solve + correction) + mass-flow correction +
# boundary-pressure synthesis, batched over envs via grid=(B,).
#
# Rationale (VERDICT r4 item 3): the staged path round-trips the state
# through HBM 6x per step (3 substage + 3 solve kernels) plus a boundary
# pair — ~40 MB of HBM traffic per env-step, which is what pinned the
# packed B=32 rollout at 1.3x single-env throughput.  Holding U/V/W/F1 in
# VMEM across the whole step cuts per-env traffic to one state read +
# one write (~3.3 MB) and amortizes the shared solve operands (T2/Ti2,
# 8.9 MB) across all B grid programs via constant index_maps.
# ---------------------------------------------------------------------------

def _rk3_full_kernel(Nz, C, nu, dx, dz, n, F, refine_steps,
                     U_ref, V_ref, W_ref, op1_ref, op2_ref,
                     dPdx_ref, meanU0_ref, dt_ref,
                     dyf_ref, dyg_ref, dym_ref, trapw_ref,
                     T2_ref, Ti2_ref,
                     A1_ref, B1_ref, denom1_ref, g_ref, ss_ref, kk_ref,
                     Pinv00_ref, s00_ref,
                     dd_ref, dl_ref, du_ref, dd0h_ref, dlm_ref,
                     A13_ref, g3_ref,
                     Un_ref, Vn_ref, Wn_ref, dPdx_out_ref, p_ref):
    sh = _shifts(Nz, C)
    dyf = dyf_ref[...]
    dyg = dyg_ref[...]
    dym = dym_ref[...]
    dPdx = dPdx_ref[0, 0]
    dt = dt_ref[0, 0]
    dlm = dlm_ref[0, 0]
    dd0h = dd0h_ref[0, 0]
    op1 = op1_ref[...]
    op2 = op2_ref[...]

    def dot(a, b):
        return jax.lax.dot(a, b, precision=_HP,
                           preferred_element_type=jnp.float32)

    U0 = U_ref[...]
    V0 = V_ref[...]
    W0 = W_ref[...]
    U, V, W = U0, V0, W0
    F1u = F1v = F1w = None
    for i, (c_cur, c_prev) in enumerate(_RK3_STAGES):
        Fu, Fv, Fw = _rhs_terms(U, V, W, dPdx, nu, dx, dz,
                                dyf, dyg, dym, sh)
        if i == 0:
            F1u, F1v, F1w = Fu, Fv, Fw
        Un = U0 + dt * c_cur * Fu
        Vn = V0 + dt * c_cur * Fv
        Wn = W0 + dt * c_cur * Fw
        if c_prev:
            Un = Un + dt * c_prev * F1u
            Vn = Vn + dt * c_prev * F1v
            Wn = Wn + dt * c_prev * F1w
        Un, Vn, Wn = _apply_bc(Un, Vn, Wn, op1, op2)
        Y = _div_k(Un, Vn, Wn, dx, dz, dyf, sh)
        U, V, W = _solve_correct_body(
            dot, n, F, Nz, C, dx, dz, refine_steps,
            Y, Un, Vn, Wn, op1, op2,
            T2_ref, Ti2_ref, A1_ref, B1_ref, denom1_ref, g_ref, ss_ref,
            kk_ref, Pinv00_ref, s00_ref, dd_ref, dl_ref, du_ref,
            dd0h, dlm, dym)

    # mass-flow correction (rk3_step_k tail), in-kernel.  The trapezoid
    # replicates jnp.trapezoid's exact term order: d_new is a tiny
    # difference of large means amplified by 1/dt, so a different
    # reduction order shifts dPdx by several % (see the dPdx note in
    # test_batched_rollout_packed_matches_vmap).
    profile = jnp.mean(U[1:-1], axis=1, keepdims=True)        # (Ny-1, 1)
    zrow1 = jnp.zeros((1, 1), jnp.float32)
    vals = jnp.concatenate([zrow1, profile, zrow1], axis=0)   # (Ny+1, 1)
    terms = (vals[1:] + vals[:-1]) * 0.5 * trapw_ref[...]     # (Ny, 1)
    meanU_now = jnp.sum(terms) * 0.5
    d_new = 2.0 * (meanU0_ref[0, 0] - meanU_now)
    row = jax.lax.broadcasted_iota(jnp.int32, (U.shape[0], 1), 0)
    interior = (row >= 1) & (row < U.shape[0] - 1)
    U = jnp.where(interior, U + 0.5 * d_new, U)
    dPdx_new = 0.5 * (dPdx + d_new / dt)

    # boundary pressures of the NEW state (kernel C inlined: the state is
    # already VMEM-resident, so this costs one RHS pass + the 4-row solve)
    Fu, Fv, Fw = _rhs_terms(U, V, W, dPdx_new, nu, dx, dz,
                            dyf, dyg, dym, sh)
    xm, xp, zm, zp = sh
    rhs = ((xp(Fu[1:-1]) - Fu[1:-1]) / dx + (Fv[1:] - Fv[:-1]) / dyf
           + (zp(Fw[1:-1]) - Fw[1:-1]) / dz)                  # (n, C)
    t = dot(rhs, T2_ref[...])
    p_ref[...] = _boundary_solve_body(
        dot, n, F, t, Ti2_ref, A13_ref, B1_ref, denom1_ref,
        g3_ref, ss_ref, dlm, Pinv00_ref, s00_ref)

    Un_ref[...] = U
    Vn_ref[...] = V
    Wn_ref[...] = W
    dPdx_out_ref[...] = jnp.full((1, C), dPdx_new, jnp.float32)


def _trap_weights(grid):
    """Segment widths dys = diff([0, ym, 2]) for the in-kernel trapezoid
    (matching jnp.trapezoid's term order in rk3_step_k/mean_u_k)."""
    f32 = jnp.float32
    ym = grid.ym.astype(f32)
    ys = jnp.concatenate([jnp.zeros((1,), f32), ym,
                          jnp.full((1,), 2.0, f32)])
    return (ys[1:] - ys[:-1]).reshape(-1, 1)                  # (Ny, 1)


def env_step_full_kb(grid, B, U, V, W, dPdx, meanU0, op1, op2,
                     interpret=False):
    """ONE pallas dispatch per step for B packed envs: full RK3 step +
    mass-flow correction + boundary pressures.

    U/W: (Ny+1, B*C), V: (Ny, B*C), dPdx/meanU0: (B,), op1/op2: (1, B*C).
    Returns (U, V, W, dPdx' (B,), p (2, B*C))."""
    interpret = interpret or INTERPRET
    Nx, Ny, Nz = grid.Nx, grid.Ny, grid.Nz
    C = Nx * Nz
    n = Ny - 1
    m = n - 1
    Nzr = Nz // 2 + 1
    F = Nx * Nzr
    F2 = 2 * F
    f32 = jnp.float32
    T2, Ti2 = _kron_mats2(Nx, Nz)
    kk2, denom1_2, g2, ss2, dlm, dl, du, dd0h = _solve_consts(grid)
    A13, g3_2 = _boundary_consts(grid)
    dyf, dyg, dym = _row_consts(grid)
    kernel = partial(_rk3_full_kernel, Nz, C, grid.nu, grid.dx, grid.dz,
                     n, F, grid.refine_steps)
    shp = lambda r: jax.ShapeDtypeStruct((r, B * C), f32)
    in_specs = [
        _bspec(Ny + 1, C), _bspec(Ny, C), _bspec(Ny + 1, C),   # U V W
        _bspec(1, C), _bspec(1, C),                            # op1 op2
        _bspec(1, C), _bspec(1, C),                            # dPdx meanU0
        _shared((1, 1)),                                       # dt
        _shared((Ny - 1, 1)), _shared((Ny, 1)), _shared((Ny - 2, 1)),
        _shared((Ny, 1)),                                      # trapw (dys)
        _shared((C, F2)), _shared((F2, C)),                    # T2 Ti2
        _shared((m, m)), _shared((m, m)),                      # A1 B1
        _shared((m, F2)), _shared((m, F2)),                    # denom1 g
        _shared((1, F2)), _shared((1, F2)),                    # ss kk
        _shared((n, n)), _shared((n, 1)),                      # Pinv00 s00
        _shared((n, 1)), _shared((n, 1)), _shared((n, 1)),     # dd dl du
        _shared((1, 1)), _shared((1, 1)),                      # dd0h dlm
        _shared((3, m)), _shared((3, F2)),                     # A13 g3
    ]
    out_shape = (shp(Ny + 1), shp(Ny), shp(Ny + 1), shp(1), shp(2))
    out_specs = (_bspec(Ny + 1, C), _bspec(Ny, C), _bspec(Ny + 1, C),
                 _bspec(1, C), _bspec(2, C))
    Un, Vn, Wn, dPdx_row, p = pl.pallas_call(
        kernel, out_shape=out_shape, grid=(B,),
        in_specs=in_specs, out_specs=out_specs,
        compiler_params=_BATCH_PARAMS,
        interpret=interpret)(
        U, V, W, op1, op2,
        jnp.repeat(dPdx.astype(f32), C)[None, :],
        jnp.repeat(meanU0.astype(f32), C)[None, :],
        jnp.full((1, 1), grid.dt, f32),
        dyf, dyg, dym, _trap_weights(grid),
        jnp.asarray(T2), jnp.asarray(Ti2),
        grid.eig_A1.astype(f32), grid.eig_B1.astype(f32),
        denom1_2, g2, ss2, kk2, grid.Pinv00_eq.astype(f32),
        grid.s00.astype(f32).reshape(n, 1),
        grid.DD_diag.astype(f32).reshape(n, 1), dl, du, dd0h, dlm,
        A13, g3_2)
    dPdx_out = dPdx_row.reshape(B, C)[:, 0]
    return Un, Vn, Wn, dPdx_out, p


def env_step_full_k(grid, kstate, opV1, opV2, interpret=False):
    """Single-env `env_step_k` on the one-dispatch kernel D path."""
    C = grid.Nx * grid.Nz
    f32 = jnp.float32
    op1 = jnp.reshape(opV1.astype(f32), (1, C))
    op2 = jnp.reshape(opV2.astype(f32), (1, C))
    U, V, W, dPdx, p = env_step_full_kb(
        grid, 1, kstate.U, kstate.V, kstate.W,
        jnp.reshape(kstate.dPdx, (1,)), jnp.reshape(kstate.meanU0, (1,)),
        op1, op2, interpret=interpret)
    kstate = kstate.replace(U=U, V=V, W=W,
                            dPdx=jnp.reshape(dPdx, kstate.dPdx.shape))
    p2 = p[1:2].reshape(grid.Nx, grid.Nz)
    info = step_metrics_k(grid, kstate, p2)
    return kstate, p2, info
