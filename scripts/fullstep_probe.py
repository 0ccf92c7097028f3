"""On-chip A/B of kernel D (whole-step fused, PDE_RK3_FULLSTEP) vs the
staged 3x(A+B)+C path (VERDICT r4 item 3).

Phases:
  1. parity: 200-step closed loop (gt policy), staged vs fullstep —
     scoreboard series must agree (chaotic divergence bounded over 200
     steps at f32).
  2. single-env throughput: bench.py-shaped 2000-step chunks, both paths.
  3. packed scaling: batched_rollout aggregate steps/s at B in {1, 8, 32},
     both paths (the round-4 finding: staged B=32 = 1.3x single).

jax caches trace on the module flag, so each configuration change calls
jax.clear_caches().  Timing: scan-over-fresh-PRNG inputs, ONE float fetch
(axon memoizes repeated executions; block_until_ready lies — CLAUDE.md).

Usage: python scripts/fullstep_probe.py [phase_max]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pde_policylearning_tpu.envs import channel_flow as cf
from pde_policylearning_tpu.envs import rk3_pallas as rk
from pde_policylearning_tpu.control import make_policy, run_closed_loop
from pde_policylearning_tpu.envs import NSControlEnv

PHASE_MAX = int(sys.argv[1]) if len(sys.argv) > 1 else 3


def closed_loop_series(fullstep, n=200):
    rk.FULLSTEP = fullstep
    jax.clear_caches()
    env = NSControlEnv(Nx=32, Ny=130, Nz=32, detect_plane=25,
                       noise_scale=0.05, seed=0, spinup_steps=0)
    policy = make_policy("gt", env.grid, detect_plane=25)
    res = run_closed_loop(env, policy, n_steps=n, log_interval=n,
                          verbose=False, div_guard=1e9)
    return res["series"]


if PHASE_MAX >= 1:
    print("phase 1: 200-step parity", flush=True)
    s_ref = closed_loop_series(False)
    s_new = closed_loop_series(True)
    for k in s_ref:
        a, b = np.asarray(s_new[k]), np.asarray(s_ref[k])
        r = np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-30)
        print(f"  {k}: rel {r:.2e} last ref {b[-1]:.4e} new {a[-1]:.4e}",
              flush=True)
    shear_ok = np.allclose(np.asarray(s_new[
        "drag_reduction/1_shear_stress"]),
        np.asarray(s_ref["drag_reduction/1_shear_stress"]), rtol=2e-2)
    div = np.asarray(s_new["drag_reduction/4_1_-|divergence|"])
    print(f"  shear parity(2%): {shear_ok}, max|div| {np.abs(div).max():.2e}",
          flush=True)

if PHASE_MAX >= 2:
    print("phase 2: single-env closed-loop throughput (2000-step chunks)",
          flush=True)
    for fullstep in (False, True):
        rk.FULLSTEP = fullstep
        jax.clear_caches()
        env = NSControlEnv(Nx=32, Ny=130, Nz=32, detect_plane=25,
                           noise_scale=0.05, seed=0, spinup_steps=0)
        policy = make_policy("gt", env.grid, detect_plane=25)
        n = 2000
        run_closed_loop(env, policy, n_steps=n, log_interval=n,
                        verbose=False)  # compile+warm
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            run_closed_loop(env, policy, n_steps=n, log_interval=n,
                            verbose=False)
            runs.append(round(n / (time.perf_counter() - t0), 1))
        print(f"  fullstep={fullstep}: median {sorted(runs)[1]} steps/s "
              f"(runs {runs})", flush=True)

if PHASE_MAX >= 3:
    print("phase 3: packed batched rollout scaling", flush=True)
    grid = cf.make_channel_grid(Nx=32, Ny=130, Nz=32, dtype=jnp.float32)
    T = 500

    from functools import partial

    @partial(jax.jit, static_argnames=("B",))
    def packed_run(key, B):
        k_init, k_roll = jax.random.split(key)
        states = cf.init_batched_states(grid, B, k_init)
        st, outs = cf.batched_rollout.__wrapped__(
            grid, states, T, policy="gt", keys=jax.random.split(k_roll, B))
        return jnp.sum(outs[0])

    def timed(fn, *args):
        fn(jax.random.PRNGKey(0), *args)
        times = []
        for s in (1, 2, 3):
            t0 = time.perf_counter()
            x = float(fn(jax.random.PRNGKey(s), *args))
            times.append(time.perf_counter() - t0)
            assert x == x, "NaN output"
        return min(times)

    for fullstep in (False, True):
        rk.FULLSTEP = fullstep
        jax.clear_caches()
        for B in (1, 8, 32):
            t = timed(packed_run, B)
            print(f"  fullstep={fullstep} B={B:3d}: "
                  f"{t / T * 1e3:7.3f} ms/batched-step "
                  f"({B * T / t:8.0f} agg env-steps/s)", flush=True)
