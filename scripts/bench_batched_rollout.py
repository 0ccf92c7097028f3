"""Measure packed batched rollout: per-step cost vs B (VERDICT item 4).

Everything (state init + rollout + reduction) runs inside ONE jit per
measurement: the first version of this probe built the batched states
EAGERLY inside the timed region, and on axon each eager op is a tunnel
RPC — a fixed ~5 s overhead that dwarfed the rollout itself and made the
packed path look 40x slower than it is.  Fresh PRNG keys defeat the
backend's execution memoization; ONE float fetch ends each timed run.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
from functools import partial

import jax
import jax.numpy as jnp
from pde_policylearning_tpu.envs import channel_flow as cf

grid = cf.make_channel_grid(Nx=32, Ny=130, Nz=32, dtype=jnp.float32)
T = 500


@partial(jax.jit, static_argnames=("B",))
def packed_run(key, B):
    k_init, k_roll = jax.random.split(key)
    states = cf.init_batched_states(grid, B, k_init)
    st, outs = cf.batched_rollout(grid, states, T, policy="gt",
                                  keys=jax.random.split(k_roll, B))
    return jnp.sum(outs[0])


@jax.jit
def single_run(key):
    k_init, k_roll = jax.random.split(key)
    state = cf.init_state(grid, key=k_init, noise=0.05)
    st, outs = cf.rollout(grid, state, T, policy="gt", key=k_roll)
    return jnp.sum(outs[0])


def timed(fn, *args):
    fn(jax.random.PRNGKey(0), *args)  # compile + warm
    times = []
    for s in (1, 2, 3):
        t0 = time.perf_counter()
        x = float(fn(jax.random.PRNGKey(s), *args))  # fresh inputs, 1 fetch
        times.append(time.perf_counter() - t0)
        assert x == x, "NaN output"
    return min(times)


t1 = timed(single_run)
print(f"single-env fused rollout: {t1 / T * 1e3:7.3f} ms/step "
      f"({T / t1:8.0f} env-steps/s)")

for B in (1, 2, 4, 8, 16, 32):
    t = timed(packed_run, B)
    per_step = t / T * 1e3
    print(f"B={B:3d}: {per_step:7.3f} ms/batched-step  "
          f"({B * T / t:8.0f} agg env-steps/s, per-env-step "
          f"{per_step / B:6.3f} ms, {per_step / (t1 / T * 1e3):5.2f}x "
      "single)")
