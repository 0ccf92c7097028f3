"""Standalone educational CFD simulation (Chorin projection, 41x41).

reference: run_cfd_simulation.py:135-345 — a self-contained channel /
cavity solver built from the same kernels as the 2-D env.  Here it reuses
the jitted kernels in envs/channel2d.py and runs a lid-driven cavity or a
forced channel to steady state.

Usage:
    python run_cfd_simulation.py [--case channel|cavity] [--steps 200]
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from pde_policylearning_tpu.envs.channel2d import (Channel2DState,
                                                   build_up_b,
                                                   pressure_poisson_periodic,
                                                   solve)


def run_channel(steps: int):
    env_state = Channel2DState(
        u=jnp.ones((41, 41)), v=jnp.zeros((41, 41)), p=jnp.zeros((41, 41)),
        F=jnp.asarray(1.0))
    dx = dy = 2.0 / 40
    state, bulk, n = solve(env_state, None, dx, dy, 0.01, 1.0, 0.1, 1.0,
                           max_step=steps)
    print(f"channel: {int(n)} iters, bulk velocity {float(bulk):.4f}, "
          f"u max {float(jnp.max(state.u)):.4f}")
    return state


def run_cavity(steps: int):
    """Lid-driven cavity: u=1 on the lid, no-slip elsewhere, non-periodic.
    Uses a Dirichlet-walls Jacobi pressure solve."""
    nx = ny = 41
    dx = dy = 2.0 / (nx - 1)
    dt, rho, nu = 0.001, 1.0, 0.1
    u = jnp.zeros((ny, nx))
    v = jnp.zeros((ny, nx))
    p = jnp.zeros((ny, nx))

    @jax.jit
    def step(u, v, p):
        u = u.at[-1, :].set(1.0).at[0, :].set(0.0)
        u = u.at[:, 0].set(0.0).at[:, -1].set(0.0)
        v = v.at[0, :].set(0.0).at[-1, :].set(0.0)
        v = v.at[:, 0].set(0.0).at[:, -1].set(0.0)
        un, vn = u, v
        b = build_up_b(rho, dt, dx, dy, u, v)
        p2 = pressure_poisson_periodic(p, dx, dy, b, 50)
        # interior update (central pressure, upwind convection)
        ui = (un[1:-1, 1:-1]
              - un[1:-1, 1:-1] * dt / dx * (un[1:-1, 1:-1] - un[1:-1, :-2])
              - vn[1:-1, 1:-1] * dt / dy * (un[1:-1, 1:-1] - un[:-2, 1:-1])
              - dt / (2 * rho * dx) * (p2[1:-1, 2:] - p2[1:-1, :-2])
              + nu * (dt / dx ** 2 * (un[1:-1, 2:] - 2 * un[1:-1, 1:-1]
                                      + un[1:-1, :-2])
                      + dt / dy ** 2 * (un[2:, 1:-1] - 2 * un[1:-1, 1:-1]
                                        + un[:-2, 1:-1])))
        vi = (vn[1:-1, 1:-1]
              - un[1:-1, 1:-1] * dt / dx * (vn[1:-1, 1:-1] - vn[1:-1, :-2])
              - vn[1:-1, 1:-1] * dt / dy * (vn[1:-1, 1:-1] - vn[:-2, 1:-1])
              - dt / (2 * rho * dy) * (p2[2:, 1:-1] - p2[:-2, 1:-1])
              + nu * (dt / dx ** 2 * (vn[1:-1, 2:] - 2 * vn[1:-1, 1:-1]
                                      + vn[1:-1, :-2])
                      + dt / dy ** 2 * (vn[2:, 1:-1] - 2 * vn[1:-1, 1:-1]
                                        + vn[:-2, 1:-1])))
        return u.at[1:-1, 1:-1].set(ui), v.at[1:-1, 1:-1].set(vi), p2

    for _ in range(steps):
        u, v, p = step(u, v, p)
    speed = jnp.sqrt(u ** 2 + v ** 2)
    print(f"cavity: max speed {float(jnp.max(speed)):.4f}, "
          f"mean |div-proxy| {float(jnp.mean(jnp.abs(p))):.4f}")
    return u, v, p


if __name__ == "__main__":
    from pde_policylearning_tpu.utils import apply_env_platform
    apply_env_platform()
    parser = argparse.ArgumentParser()
    parser.add_argument("--case", default="channel",
                        choices=["channel", "cavity"])
    parser.add_argument("--steps", type=int, default=200)
    args = parser.parse_args()
    if args.case == "channel":
        run_channel(args.steps)
    else:
        run_cavity(args.steps)
