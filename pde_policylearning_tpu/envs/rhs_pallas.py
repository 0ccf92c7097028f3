"""Fused Pallas kernels for the momentum RHS (convection+diffusion+forcing).

`channel_flow.compute_rhs` lowers to ~25 small elementwise/roll kernels
(~0.085 ms at the reference grid, latency-bound); here each component is
ONE pallas_call with the staggered state resident in VMEM.  Mosaic
supports jnp.roll on both the lane (z) and major (x) axes of the
(Nx, Ny+1, Nz) layout directly (verified exact on hardware), y-stencils
are sublane slices, and the wall-ghost padding is a concat with zero rows.
Measured: rk3_step 0.558 -> 0.487 ms with these + the fused Poisson.

Gradients delegate to the unfused implementation via a custom VJP (the
physics-informed losses differentiate through compute_rhs).

reference: control_env.py:429-530 (compute_rhs_py).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# the z=32 lane dim pads to 128, so the per-kernel live set slightly
# exceeds the default 16 MB scoped-vmem budget; v5e has headroom above it
_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024)


# One kernel per component: the z=32 lane dim pads to 128, so every
# (Nx, Ny+1, Nz) temporary costs 4x its logical size — the all-in-one
# kernel exceeds the 16 MB VMEM stack.  Shared products (UV/UW/VW) are
# recomputed per component (cheap VPU math) to keep each kernel's live
# set ~12 MB.  3 dispatches still beats the ~25 of the unfused path.

def _xp(a):
    return jnp.roll(a, -1, axis=0)


def _xm(a):
    return jnp.roll(a, 1, axis=0)


def _zp(a):
    return jnp.roll(a, -1, axis=2)


def _zm(a):
    return jnp.roll(a, 1, axis=2)


def _pad_y(a, Nx, Nz):
    zrow = jnp.zeros((Nx, 1, Nz), jnp.float32)
    return jnp.concatenate([zrow, a, zrow], axis=1)


def _fu_kernel(nu, dx, dz, u_ref, v_ref, w_ref, dyf_ref, dyg_ref,
               dpdx_ref, fu_ref):
    U, V, W = u_ref[...], v_ref[...], w_ref[...]
    dyf, dyg = dyf_ref[...], dyg_ref[...]
    Nx, _, Nz = U.shape
    UU = (0.5 * (U + _xp(U))) ** 2
    Fu = -(UU - _xm(UU)) / dx
    UV = (0.5 * (V + _xm(V))) * (0.5 * (U[:, :-1] + U[:, 1:]))
    Fu = Fu - _pad_y((UV[:, 1:] - UV[:, :-1]) / dyf, Nx, Nz)
    UW = (0.5 * (W + _xm(W))) * (0.5 * (U + _zm(U)))
    Fu = Fu - (_zp(UW) - UW) / dz
    Fu = Fu + nu * (_xp(U) - 2 * U + _xm(U)) / dx ** 2
    dU = (U[:, 1:] - U[:, :-1]) / dyg
    Fu = Fu + _pad_y(nu * (dU[:, 1:] - dU[:, :-1]) / dyf, Nx, Nz)
    Fu = Fu + nu * (_zp(U) - 2 * U + _zm(U)) / dz ** 2
    fu_ref[...] = Fu + dpdx_ref[0, 0] / 2


def _fv_kernel(nu, dx, dz, u_ref, v_ref, w_ref, dyf_ref, dym_ref, fv_ref):
    U, V, W = u_ref[...], v_ref[...], w_ref[...]
    dyf, dym = dyf_ref[...], dym_ref[...]
    Nx, _, Nz = V.shape
    UV = (0.5 * (V + _xm(V))) * (0.5 * (U[:, :-1] + U[:, 1:]))
    Fv = -(_xp(UV) - UV) / dx
    VV = (0.5 * (V[:, :-1] + V[:, 1:])) ** 2
    Fv = Fv - _pad_y((VV[:, 1:] - VV[:, :-1]) / dym, Nx, Nz)
    VW = (0.5 * (V + _zm(V))) * (0.5 * (W[:, :-1] + W[:, 1:]))
    Fv = Fv - (_zp(VW) - VW) / dz
    Fv = Fv + nu * (_xp(V) - 2 * V + _xm(V)) / dx ** 2
    dV = (V[:, 1:] - V[:, :-1]) / dyf
    Fv = Fv + _pad_y(nu * (dV[:, 1:] - dV[:, :-1]) / dym, Nx, Nz)
    fv_ref[...] = Fv + nu * (_zp(V) - 2 * V + _zm(V)) / dz ** 2


def _fw_kernel(nu, dx, dz, u_ref, v_ref, w_ref, dyf_ref, dyg_ref, fw_ref):
    U, V, W = u_ref[...], v_ref[...], w_ref[...]
    dyf, dyg = dyf_ref[...], dyg_ref[...]
    Nx, _, Nz = W.shape
    UW = (0.5 * (W + _xm(W))) * (0.5 * (U + _zm(U)))
    Fw = -(_xp(UW) - UW) / dx
    VW = (0.5 * (V + _zm(V))) * (0.5 * (W[:, :-1] + W[:, 1:]))
    Fw = Fw - _pad_y((VW[:, 1:] - VW[:, :-1]) / dyf, Nx, Nz)
    WW = (0.5 * (W + _zp(W))) ** 2
    Fw = Fw - (WW - _zm(WW)) / dz
    Fw = Fw + nu * (_xp(W) - 2 * W + _xm(W)) / dx ** 2
    dW = (W[:, 1:] - W[:, :-1]) / dyg
    Fw = Fw + _pad_y(nu * (dW[:, 1:] - dW[:, :-1]) / dyf, Nx, Nz)
    fw_ref[...] = Fw + nu * (_zp(W) - 2 * W + _zm(W)) / dz ** 2


def _rhs_impl(grid, U, V, W, dPdx, interpret: bool = False):
    f32 = jnp.float32
    y, ym, yg = grid.y, grid.ym, grid.yg
    dyf = (y[1:] - y[:-1]).astype(f32)[:, None]
    dyg = (yg[1:] - yg[:-1]).astype(f32)[:, None]
    dym = (ym[1:] - ym[:-1]).astype(f32)[:, None]
    dpdx = jnp.broadcast_to(jnp.asarray(dPdx, f32), (1, 1))
    shp = jax.ShapeDtypeStruct
    nu, dx, dz = float(grid.nu), float(grid.dx), float(grid.dz)
    U, V, W = U.astype(f32), V.astype(f32), W.astype(f32)
    kw = {} if interpret else {"compiler_params": _PARAMS}
    Fu = pl.pallas_call(
        partial(_fu_kernel, nu, dx, dz), out_shape=shp(U.shape, f32),
        interpret=interpret, **kw)(U, V, W, dyf, dyg, dpdx)
    Fv = pl.pallas_call(
        partial(_fv_kernel, nu, dx, dz), out_shape=shp(V.shape, f32),
        interpret=interpret, **kw)(U, V, W, dyf, dym)
    Fw = pl.pallas_call(
        partial(_fw_kernel, nu, dx, dz), out_shape=shp(W.shape, f32),
        interpret=interpret, **kw)(U, V, W, dyf, dyg)
    return Fu, Fv, Fw


@jax.custom_vjp
def compute_rhs_fused(grid, U, V, W, dPdx):
    """Fused-VMEM momentum RHS (f32); numerically equivalent to
    `channel_flow.compute_rhs`."""
    return _rhs_impl(grid, U, V, W, dPdx)


def _fwd(grid, U, V, W, dPdx):
    return _rhs_impl(grid, U, V, W, dPdx), (grid, U, V, W, dPdx)


def _bwd(res, g):
    from . import channel_flow as cf
    grid, U, V, W, dPdx = res
    _, vjp = jax.vjp(
        lambda u, v, w, d: cf._compute_rhs_unfused(grid, u, v, w, d),
        U, V, W, dPdx)
    dU, dV, dW, dd = vjp(tuple(x.astype(U.dtype) for x in g))
    zero_grid = jax.tree.map(jnp.zeros_like, grid)
    return zero_grid, dU, dV, dW, dd


compute_rhs_fused.defvjp(_fwd, _bwd)
