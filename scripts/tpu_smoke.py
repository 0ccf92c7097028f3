"""TPU smoke / re-verification script (run on the real chip).

Covers the flows most recently changed: the real-stacked Poisson solve
(single vs vmapped consistency — the backend complex-vmap bug class),
closed-loop throughput, batched rollout scaling, and the observer train
step.  Usage: python scripts/tpu_smoke.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def main():
    from pde_policylearning_tpu.envs import channel_flow as cf
    from pde_policylearning_tpu.control import make_policy, run_closed_loop
    from pde_policylearning_tpu.envs import NSControlEnv

    print("devices:", jax.devices())
    grid = cf.make_channel_grid()

    # [1] vmapped step == single step (complex-vmap regression)
    states = cf.init_batched_states(grid, 2, jax.random.PRNGKey(0),
                                    noise=0.02)
    z = jnp.zeros((2, 32, 32))
    stepped = jax.jit(jax.vmap(lambda s, o: cf.rk3_step(grid, s, o, o)))(
        states, z)
    s1 = jax.tree.map(lambda a: a[0], states)
    t1 = jax.jit(lambda s, o: cf.rk3_step(grid, s, o, o))(s1, z[0])
    diff = float(jnp.max(jnp.abs(stepped.U[0] - t1.U)))
    print(f"[1] vmapped vs single step max diff: {diff:.3e} "
          f"({'OK' if diff < 1e-5 else 'FAIL'})")

    # [2] vmapped stability over 20 steps
    s = states
    step_v = jax.jit(jax.vmap(lambda st, o: cf.rk3_step(grid, st, o, o)))
    for _ in range(20):
        s = step_v(s, z)
    print("[2] vmapped 20 steps finite:", bool(jnp.isfinite(s.U).all()))

    # [3] closed-loop throughput (the bench metric)
    env = NSControlEnv(detect_plane=25, noise_scale=0.05, seed=0)
    pol = make_policy("gt", env.grid, detect_plane=25)
    run_closed_loop(env, pol, n_steps=500, log_interval=500, verbose=False)
    t0 = time.perf_counter()
    run_closed_loop(env, pol, n_steps=500, log_interval=500, verbose=False)
    print(f"[3] closed loop: {500 / (time.perf_counter() - t0):.0f} steps/s")

    # [4] batched rollout aggregate throughput
    B, n = 8, 200
    bs = cf.init_batched_states(grid, B, jax.random.PRNGKey(1))
    s2, _ = cf.batched_rollout(grid, bs, n, policy="gt")
    jax.block_until_ready(s2.U)
    t0 = time.perf_counter()
    s3, _ = cf.batched_rollout(grid, s2, n, policy="gt")
    jax.block_until_ready(s3.U)
    dt = time.perf_counter() - t0
    print(f"[4] batched rollout: {B * n / dt:.0f} aggregate steps/s, "
          f"finite {bool(jnp.isfinite(s3.U).all())}")


if __name__ == "__main__":
    main()
