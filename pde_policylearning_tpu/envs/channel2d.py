"""2-D channel-flow control environment (Chorin projection, collocated grid).

reference: libs/envs/ns_control_2d.py:70 (NSControlEnv2D) and the kernels
build_up_b(:13) / pressure_poisson_periodic(:41): 41x41 grid, periodic x,
no-slip walls with wall-normal actuation, Jacobi pressure iterations, flow
driven by force F, implicit iteration to (quasi-)steady state, bisection on
F for constant mass flow (solve_fixed_mass:493).

TPU re-design: Jacobi sweeps are a fori_loop, the steady-state iteration is
a lax.while_loop on the relative change, and bisection runs as a bounded
fori over the jitted solver — the whole `step` compiles to one program.
Array layout (ny, nx): rows = y (walls at 0 and -1), cols = x (periodic).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Channel2DState(NamedTuple):
    u: jnp.ndarray
    v: jnp.ndarray
    p: jnp.ndarray
    F: jnp.ndarray


def _roll_x(a, shift):
    return jnp.roll(a, shift, axis=1)


def build_up_b(rho, dt, dx, dy, u, v):
    """Pressure-Poisson source (ns_control_2d.py:13-38), vectorized with
    periodic x via rolls; wall rows stay zero."""
    ux = (_roll_x(u, -1) - _roll_x(u, 1)) / (2 * dx)
    vy = jnp.zeros_like(v)
    vy = vy.at[1:-1, :].set((v[2:, :] - v[:-2, :]) / (2 * dy))
    uy = jnp.zeros_like(u)
    uy = uy.at[1:-1, :].set((u[2:, :] - u[:-2, :]) / (2 * dy))
    vx = (_roll_x(v, -1) - _roll_x(v, 1)) / (2 * dx)
    b = rho * (ux / dt - ux ** 2 - 2 * uy * vx - vy ** 2)
    b = b + rho * vy / dt
    return b.at[0, :].set(0.0).at[-1, :].set(0.0)


def pressure_poisson_periodic(p, dx, dy, b, nit: int = 50):
    """Jacobi iterations with periodic x and dp/dy=0 walls
    (ns_control_2d.py:41-68)."""
    denom = 2 * (dx ** 2 + dy ** 2)

    def sweep(_, p):
        pn = p
        px = (_roll_x(pn, -1) + _roll_x(pn, 1)) * dy ** 2
        py = jnp.zeros_like(pn)
        py = py.at[1:-1, :].set((pn[2:, :] + pn[:-2, :]) * dx ** 2)
        new = (px + py) / denom - dx ** 2 * dy ** 2 / denom * b
        p = p.at[1:-1, :].set(new[1:-1, :])
        p = p.at[-1, :].set(p[-2, :])
        p = p.at[0, :].set(p[1, :])
        return p

    return jax.lax.fori_loop(0, nit, sweep, p)


def _momentum_update(un, vn, p, dx, dy, dt, rho, nu, F):
    """Upwind convection + central diffusion + pressure gradient + forcing
    (ns_control_2d.py:382-478), vectorized over periodic x."""
    conv_u = (un * dt / dx * (un - _roll_x(un, 1)))
    conv_v_u = jnp.zeros_like(un)
    conv_v_u = conv_v_u.at[1:-1, :].set(
        vn[1:-1, :] * dt / dy * (un[1:-1, :] - un[:-2, :]))
    px = dt / (2 * rho * dx) * (_roll_x(p, -1) - _roll_x(p, 1))
    lap_u = jnp.zeros_like(un)
    lap_u = lap_u.at[1:-1, :].set(
        nu * (dt / dx ** 2 * (_roll_x(un, -1) - 2 * un
                              + _roll_x(un, 1))[1:-1, :]
              + dt / dy ** 2 * (un[2:, :] - 2 * un[1:-1, :] + un[:-2, :])))
    u = un - conv_u - conv_v_u - px + lap_u + F * dt

    conv_u_v = (un * dt / dx * (vn - _roll_x(vn, 1)))
    conv_v_v = jnp.zeros_like(vn)
    conv_v_v = conv_v_v.at[1:-1, :].set(
        vn[1:-1, :] * dt / dy * (vn[1:-1, :] - vn[:-2, :]))
    py = jnp.zeros_like(p)
    py = py.at[1:-1, :].set(dt / (2 * rho * dy) * (p[2:, :] - p[:-2, :]))
    lap_v = jnp.zeros_like(vn)
    lap_v = lap_v.at[1:-1, :].set(
        nu * (dt / dx ** 2 * (_roll_x(vn, -1) - 2 * vn
                              + _roll_x(vn, 1))[1:-1, :]
              + dt / dy ** 2 * (vn[2:, :] - 2 * vn[1:-1, :] + vn[:-2, :])))
    v = vn - conv_u_v - conv_v_v - py + lap_v

    # wall rows are overwritten by the BC before use
    u = u.at[0, :].set(un[0, :]).at[-1, :].set(un[-1, :])
    v = v.at[0, :].set(vn[0, :]).at[-1, :].set(vn[-1, :])
    return u, v


@partial(jax.jit, static_argnames=("nit", "max_step"))
def solve(state: Channel2DState, bc, dx, dy, dt, rho, nu, F,
          nit: int = 50, max_step: int = -1, u_diff_thre: float = 1e-2):
    """Iterate to steady state (or `max_step` iterations)
    (ns_control_2d.py:359-491).  bc = (bottom_v, top_v) or None."""
    u, v, p = state.u, state.v, state.p
    if bc is None:
        bot = jnp.zeros(u.shape[1], u.dtype)
        top = jnp.zeros(u.shape[1], u.dtype)
    else:
        bot, top = bc
    limit = max_step if max_step > 0 else 5000

    def apply_bc(u, v):
        u = u.at[0, :].set(0.0).at[-1, :].set(0.0)
        v = v.at[0, :].set(bot).at[-1, :].set(top)
        return u, v

    def cond(carry):
        u, v, p, udiff, it = carry
        return (udiff > u_diff_thre) & (it < limit)

    def body(carry):
        u, v, p, _, it = carry
        u, v = apply_bc(u, v)
        un, vn = u, v
        b = build_up_b(rho, dt, dx, dy, u, v)
        p = pressure_poisson_periodic(p, dx, dy, b, nit)
        u, v = _momentum_update(un, vn, p, dx, dy, dt, rho, nu, F)
        udiff = (jnp.sum(u) - jnp.sum(un)) / jnp.sum(u)
        return (u, v, p, jnp.abs(udiff), it + 1)

    u, v, p, _, steps = jax.lax.while_loop(
        cond, body, (u, v, p, jnp.asarray(1.0, u.dtype), 0))
    bulk_v = jnp.mean(jnp.abs(u))
    return Channel2DState(u=u, v=v, p=p, F=jnp.asarray(F, u.dtype)), \
        bulk_v, steps


@partial(jax.jit, static_argnames=("n_bisect",))
def solve_fixed_mass(state: Channel2DState, bc, target_flow, dx, dy, dt,
                     rho, nu, min_f: float = 0.0, max_f: float = 3.0,
                     n_bisect: int = 20):
    """Bisection on the forcing F for constant mass flow
    (ns_control_2d.py:493-536), as a bounded fori_loop of steady solves."""
    def flow_for(F):
        _, bulk, _ = solve(state, bc, dx, dy, dt, rho, nu, F)
        return bulk

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        v = flow_for(mid)
        lo = jnp.where(v < target_flow, mid, lo)
        hi = jnp.where(v < target_flow, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, n_bisect, body,
                               (jnp.asarray(min_f), jnp.asarray(max_f)))
    mid = 0.5 * (lo + hi)
    return mid, flow_for(mid)


class NSControlEnv2D:
    """Stateful wrapper with the reference's step/info contract
    (ns_control_2d.py:70-586)."""

    def __init__(self, detect_plane: int = -10, bc_type: str = "original",
                 Re: float = 100.0, fix_flow: bool = False, seed: int = 0,
                 dtype=jnp.float64):
        self.detect_plane = detect_plane
        self.bc_type = bc_type
        self.fix_flow = fix_flow
        self.Re = Re
        self.nx = self.ny = 41
        self.nit = 50
        self.dx = 2.0 / (self.nx - 1)
        self.dy = 2.0 / (self.ny - 1)
        self.rho = 1.0
        self.F = 4.0
        self.dt = 0.01
        rng = np.random.default_rng(seed)
        u = np.ones((self.ny, self.nx))
        v = 0.15 + rng.random((self.ny, self.nx)) * 0.1
        p = v.copy()
        self.nu = float(u.max() / Re)
        self.state = Channel2DState(
            u=jnp.asarray(u, dtype), v=jnp.asarray(v, dtype),
            p=jnp.asarray(p, dtype), F=jnp.asarray(self.F, dtype))
        self.state, bulk, _ = solve(self.state, None, self.dx, self.dy,
                                    self.dt, self.rho, self.nu, self.F)
        self.bulk_v = float(bulk)
        self.init_bulk_v = None
        self.info_init = None

    @property
    def u(self):
        return np.asarray(self.state.u)

    @property
    def v(self):
        return np.asarray(self.state.v)

    @property
    def p(self):
        return np.asarray(self.state.p)

    def cal_bulk_v(self):
        return float(jnp.mean(jnp.abs(self.state.u)))

    def cal_div(self):
        s = self.state
        ux = (s.u[10, 10] - s.u[9, 10]) / self.dx
        uy = (s.v[10, 10] - s.v[10, 9]) / self.dy
        return float(ux + uy)

    def reward_div(self, bound=-100.0):
        return max(-abs(self.cal_div()), bound)

    def cal_speed_norm(self):
        return float(jnp.linalg.norm(self.state.u)
                     + jnp.linalg.norm(self.state.v))

    def cal_shear_stress(self):
        s = self.state
        dudy = (s.u[-1, :] - s.u[-2, :]) / self.dy
        tau = -s.u[-1, :] * s.v[-1, :] + self.nu * dudy
        return float(jnp.abs(jnp.mean(tau)))

    def cal_velocity_mean(self, name="U", sample_index=None):
        a = self.state.u if name == "U" else self.state.v
        return float(jnp.mean(jnp.abs(a)))

    def get_top_pressure(self):
        return np.asarray(self.state.p[-1, :])

    def gt_control(self):
        bot = -np.asarray(self.state.v[-self.detect_plane, :])
        top = -np.asarray(self.state.v[self.detect_plane, :])
        return bot, top

    def reset_init(self):
        self.init_bulk_v = self.cal_bulk_v()
        self.info_init = None

    def cal_relative_info(self, info):
        if not self.info_init:
            self.info_init = dict(info)
        rel = {}
        for k, value in info.items():
            if "divergence" in k or not k.startswith("drag_reduction/"):
                continue
            denom = self.info_init[k]
            rel[k.replace("drag_reduction", "drag_reduction_relative")] = \
                value / denom if denom else 0.0
        return rel

    def step(self, bc, print_info: bool = False):
        if bc is not None:
            bc = (jnp.asarray(bc[0], self.state.u.dtype),
                  jnp.asarray(bc[1], self.state.u.dtype))
        self.state, _, _ = solve(self.state, bc, self.dx, self.dy, self.dt,
                                 self.rho, self.nu, float(self.state.F),
                                 max_step=3)
        if self.init_bulk_v is None:
            self.reset_init()
        if self.fix_flow:
            F, flow = solve_fixed_mass(self.state, bc, self.init_bulk_v,
                                       self.dx, self.dy, self.dt, self.rho,
                                       self.nu, max_f=3 * self.F)
            self.state = self.state._replace(
                F=jnp.asarray(F, self.state.u.dtype))
            dpdx_reverse = float(F)
        else:
            dpdx_reverse = -1.0
        pressure_top = self.get_top_pressure()
        info = {
            "drag_reduction/1_shear_stress": self.cal_shear_stress(),
            "drag_reduction/2_1_mass_flow": self.cal_velocity_mean("U"),
            "drag_reduction/2_2_v_velocity": self.cal_velocity_mean("V"),
            "drag_reduction/3_1_pressure_mean": float(pressure_top.mean()),
            "drag_reduction/3_2_dPdx_required": dpdx_reverse,
            "drag_reduction/4_1_-|divergence|": self.reward_div(),
            "drag_reduction/4_2_speed_norm": self.cal_speed_norm(),
        }
        if not np.isfinite(info["drag_reduction/4_2_speed_norm"]):
            raise RuntimeError("control exploded!")
        info.update(self.cal_relative_info(info))
        if print_info:
            print(info)
        return pressure_top, info["drag_reduction/4_1_-|divergence|"], \
            False, info
