"""Localize the bench-vs-kernel gap in the closed-loop harness.

rk3_sink_probe times the bare jitted loop body (one scalar fetch) at
~175 us/step; bench.py (run_closed_loop, one 2000-step chunk) measures
~221 us/step.  This probe decomposes the difference into:

  chunk+scoreboard   closed_loop_chunk blocked on its (9, n) info fetch
  chunk, state-only  same jit, blocking on the carried state (1 scalar)
  run_closed_loop    the full public harness (what bench.py times)
  fetch (9, n)       device_get of a resident (9, n) f32 array
  null dispatch      round trip of an empty jitted identity

Usage: python scripts/loop_overhead_probe.py [n_steps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pde_policylearning_tpu.control import make_policy, run_closed_loop
from pde_policylearning_tpu.control import loop as looplib
from pde_policylearning_tpu.envs import NSControlEnv
from pde_policylearning_tpu.envs import channel_flow as cf

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2000

env = NSControlEnv(Nx=32, Ny=130, Nz=32, detect_plane=25,
                   noise_scale=0.05, seed=0, spinup_steps=0)
policy = make_policy("gt", env.grid, detect_plane=25)
_, p2_0 = looplib._boundary_pressures_jit(env.grid, env.state)
key = jax.random.PRNGKey(0)


def best_of(fn, k=3):
    fn()  # warm / compile
    best = 1e9
    for _ in range(k):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def report(tag, dt):
    print(f"{tag:24s} {dt * 1e3:8.1f} ms  ({dt / N * 1e6:6.1f} us/step, "
          f"{N / dt:7.0f} steps/s)", flush=True)


# 1. full public harness (what bench.py measures)
t_run = best_of(lambda: run_closed_loop(env, policy, n_steps=N,
                                        log_interval=N, verbose=False))
report("run_closed_loop", t_run)

# 2. the jitted chunk, blocked on the scoreboard fetch
state0 = env.state


def chunk_full():
    _, _, _, _k, outs = looplib.closed_loop_chunk(
        env.grid, state0, p2_0, policy, N, key)
    np.asarray(outs[0])


t_chunk = best_of(chunk_full)
report("chunk + (9,n) fetch", t_chunk)


# 3. same chunk, blocking only on the carried state (no scoreboard fetch)
def chunk_state_only():
    st, _, _, _k, _ = looplib.closed_loop_chunk(
        env.grid, state0, p2_0, policy, N, key)
    float(jnp.sum(jax.tree.leaves(st)[0]))


t_state = best_of(chunk_state_only)
report("chunk, state-only", t_state)

# 4. raw fetch of a resident (9, N) array
mat = jnp.zeros((9, N), jnp.float32) + 1.0
np.asarray(mat)
t_fetch = best_of(lambda: np.asarray(mat))
report("fetch (9,n) resident", t_fetch)

# 5. null dispatch round trip
nul = jax.jit(lambda x: x + 1.0)
x1 = jnp.ones(())
t_null = best_of(lambda: float(nul(x1)))
report("null jit round trip", t_null)

print(f"\nharness - chunk:      {(t_run - t_chunk) * 1e3:7.1f} ms "
      f"(host glue + extra dispatches)")
print(f"scoreboard overhead:  {(t_chunk - t_state) * 1e3:7.1f} ms "
      f"(stack+fetch vs state-only block)")
