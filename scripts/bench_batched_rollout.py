"""Measure packed batched rollout: per-step cost vs B (VERDICT item 4)."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import numpy as np
import jax, jax.numpy as jnp
from pde_policylearning_tpu.envs import channel_flow as cf

grid = cf.make_channel_grid(Nx=32, Ny=130, Nz=32, dtype=jnp.float32)
T = 500

def run(B, seed):
    states = cf.init_batched_states(grid, B, jax.random.PRNGKey(seed))
    st, outs = cf.batched_rollout(grid, states, T, policy="gt")
    return outs[0]  # (B, T, Nx, Nz)

for B in (1, 2, 4, 8, 16):
    run(B, 0)  # compile + warm
    times = []
    for s in (1, 2, 3):
        t0 = time.perf_counter()
        out = run(B, s)
        x = float(jnp.sum(out))  # force real execution (fresh inputs)
        times.append(time.perf_counter() - t0)
    t = min(times)
    per_step = t / T * 1e3
    print(f"B={B:3d}: {per_step:7.3f} ms/batched-step  "
          f"({B*T/t:8.0f} agg env-steps/s, per-env-step "
          f"{per_step/B:.3f} ms; finite {np.isfinite(x)})")
