"""Isolate the optimal-policy-observer TPU-worker crash.

Stages (each prints before/after so the crash point is visible):
  1. build env + trained fullfield observer + zero-init policy
  2. compile + run ONE adaptive control step (n_steps=1 chunk)
  3. run a 200-step chunk
  4. run 2000 steps through run_closed_loop (the drag-study shape)

Usage: python scripts/opo_probe.py [stage_max]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

STAGE_MAX = int(sys.argv[1]) if len(sys.argv) > 1 else 4

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from drag_study import fresh_env, policy_model_policy  # noqa: E402

from pde_policylearning_tpu.control import run_closed_loop  # noqa: E402
from pde_policylearning_tpu.control import loop as looplib  # noqa: E402

print("stage 1: build", flush=True)
env = fresh_env()
pol, tag = policy_model_policy(env)
print(f"stage 1 done ({tag})", flush=True)

if STAGE_MAX >= 2:
    print("stage 2: 1-step chunk compile+run", flush=True)
    t0 = time.time()
    _, p2 = looplib._boundary_pressures_jit(env.grid, env.state)
    st, p2o, pc, _k, outs = looplib.closed_loop_chunk(
        env.grid, env.state, p2, pol.step_fn, 1, jax.random.PRNGKey(0),
        policy_carry=pol.init_carry)
    mat = np.asarray(outs[0])
    print(f"stage 2 done in {time.time() - t0:.1f}s, "
          f"shear {mat[0, 0]:.6e}", flush=True)

if STAGE_MAX >= 3:
    print("stage 3: 200-step chunk", flush=True)
    # release stage-2 leftovers first: each held carry is ~3.6 GB on
    # device (policy params + Adam moments + observer params)
    del st, p2o, pc, outs
    t0 = time.time()
    st, p2o, pc, _k, outs = looplib.closed_loop_chunk(
        env.grid, env.state, p2, pol.step_fn, 200, jax.random.PRNGKey(1),
        policy_carry=pol.init_carry)
    mat = np.asarray(outs[0])
    del st, p2o, pc, outs
    print(f"stage 3 done in {time.time() - t0:.1f}s, "
          f"shear {mat[0, -1]:.6e} div {mat[7, -1]:.2e}", flush=True)

if STAGE_MAX >= 4:
    print("stage 4: run_closed_loop 2000", flush=True)
    t0 = time.time()
    res = run_closed_loop(env, pol, n_steps=2000, log_interval=2000,
                          detect_plane=25, div_guard=1e9, verbose=False)
    s = res["series"]["drag_reduction/1_shear_stress"]
    print(f"stage 4 done in {time.time() - t0:.1f}s, "
          f"tail shear {np.mean(s[1000:]):.6e}", flush=True)
