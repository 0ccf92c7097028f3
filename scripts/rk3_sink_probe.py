"""Per-phase cost decomposition of the fused closed-loop env step.

Times each stage of env_step_k as a scan that carries the evolving state
(fresh inputs every iteration, axon-memoization-proof) and ends in ONE
host fetch.  Differences between phases localize the remaining cost of
the headline bench (VERDICT r4 item 3: >=5000 steps/s or a recorded
experiment naming the blocker).

Phases:
  substage   x3  the advection/diffusion RHS kernel alone
  solve      x3  the bordered Poisson solve + correction kernel alone
  rk3        rk3_step_k = 3x(substage+solve) + mass-flow XLA glue
  boundary   the two boundary-pressure kernels
  env        env_step_k = rk3 + boundary + scoreboard metrics
  loop       closed-loop body (gt policy + env)

Usage: python scripts/rk3_sink_probe.py [n_steps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pde_policylearning_tpu.control import make_policy
from pde_policylearning_tpu.envs import NSControlEnv
from pde_policylearning_tpu.envs import channel_flow as cf
from pde_policylearning_tpu.envs import rk3_pallas as rk

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2000

env = NSControlEnv(Nx=32, Ny=130, Nz=32, detect_plane=25,
                   noise_scale=0.05, seed=0)
grid = env.grid
kst = rk.state_to_kstate(env.state)
_, p2_0 = cf.boundary_pressures(grid, env.state)
op0 = jnp.zeros((1, grid.Nx * grid.Nz), jnp.float32)
policy = make_policy("gt", grid, detect_plane=25)


def timed(tag, body, carry):
    @jax.jit
    def many(carry):
        def f(c, _):
            return body(c), None
        c, _ = jax.lax.scan(f, carry, None, length=N)
        return jax.tree.map(lambda a: jnp.sum(a.astype(jnp.float32)),
                            jax.tree.leaves(c)[0])
    float(many(carry))  # compile + warm
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(many(carry))
        best = min(best, time.perf_counter() - t0)
    print(f"{tag:12s} {best / N * 1e6:8.1f} us/iter "
          f"({N / best:8.0f} it/s)", flush=True)
    return best


# substage kernel alone (stage-1 coefficients, carries U,V,W)
c1, c0 = rk._RK3_STAGES[0]
F1 = (jnp.zeros_like(kst.U), jnp.zeros_like(kst.V), jnp.zeros_like(kst.W))


def substage(c):
    U, V, W = c
    Un, Vn, Wn, div, Fu, Fv, Fw = rk._substage_call(
        grid, U, V, W, U, V, W, F1, op0, op0, kst.dPdx, c1, c0, out_f=True)
    return (Un, Vn, Wn)


def solve(c):
    U, V, W = c
    div = rk.divergence_k(grid, U, V, W)
    return rk._solve_correct_call(grid, div, U, V, W, op0, op0)


def rk3(c):
    U, V, W, dPdx = c
    return rk.rk3_step_k(grid, U, V, W, dPdx, kst.meanU0, op0, op0)


def boundary(c):
    U, V, W = c
    p1, p2 = rk.boundary_pressures_k(grid, U, V, W, kst.dPdx)
    # fold the pressures back so the carry evolves
    return (U + 1e-12 * p2.reshape(1, -1), V, W)


def envstep(c):
    st, _ = c
    st, p2, info = rk.env_step_k(grid, st, op0.reshape(grid.Nx, grid.Nz),
                                 op0.reshape(grid.Nx, grid.Nz))
    return (st, p2)


def loop_body(c):
    st, p2 = c
    opV1, opV2 = policy(st, p2, jax.random.PRNGKey(0))
    st, p2, info = rk.env_step_k(grid, st, opV1, opV2)
    return (st, p2)


uvw = (kst.U, kst.V, kst.W)
t_sub = timed("substage", substage, uvw)
t_sol = timed("solve", solve, uvw)
t_rk3 = timed("rk3(3x each)", rk3, (kst.U, kst.V, kst.W, kst.dPdx))
t_bnd = timed("boundary", boundary, uvw)
t_env = timed("env_step_k", envstep, (kst, p2_0))
t_lp = timed("closed loop", loop_body, (kst, p2_0))

us = 1e6 / N
print(f"\nglue (rk3 - 3*(sub+solve)): "
      f"{(t_rk3 - 3 * (t_sub + t_sol)) * us:7.1f} us")
print(f"metrics (env - rk3 - bnd):  "
      f"{(t_env - t_rk3 - t_bnd) * us:7.1f} us")
print(f"policy (loop - env):        {(t_lp - t_env) * us:7.1f} us")
