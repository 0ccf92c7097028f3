"""Closed-loop control rollout, fully on device.

reference: run_control.py:135-316 (the sequential control loop).  The
observe -> policy -> actuate -> score cycle is one `lax.scan` body; the wall
pressure rides in the carry so each step runs exactly one pressure solve.
Host interaction is one fetch per chunk (for logging + the divergence guard,
run_control.py:294-295).
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..envs import channel_flow as cf


@partial(jax.jit, static_argnames=("policy_fn", "n_steps", "collect_planes"))
def closed_loop_chunk(grid, state, p2, policy_fn: Callable, n_steps: int,
                      key, collect_planes: bool = False, policy_carry=None):
    stateful = policy_carry is not None

    def body(carry, k):
        st, p2_obs, pc = carry
        if stateful:
            opV1, opV2, pc = policy_fn(pc, st, p2_obs, k)
        else:
            opV1, opV2 = policy_fn(st, p2_obs, k)
        st = cf.rk3_step(grid, st, opV1, opV2)
        _, p2_next = cf.boundary_pressures(grid, st)
        info = cf.step_metrics(grid, st, p2_next)
        out = (info, p2_next, opV2) if collect_planes else (info,)
        return (st, p2_next, pc), out

    keys = jax.random.split(key, n_steps)
    (state, p2, policy_carry), outs = jax.lax.scan(
        body, (state, p2, policy_carry), keys)
    return state, p2, policy_carry, outs


def run_closed_loop(env, policy_fn, n_steps: int,
                    log_interval: int = 200,
                    div_guard: float = 10.0,
                    collect_planes: bool = False,
                    seed: int = 0,
                    verbose: bool = True,
                    on_chunk=None):
    """Drive `env` with `policy_fn` for n_steps; returns the metric time
    series (and optionally the collected p2/opV2 planes).

    Aborts (raises RuntimeError) if |divergence| exceeds `div_guard`,
    mirroring run_control.py:294-295.
    """
    key = jax.random.PRNGKey(seed)
    _, p2 = cf.boundary_pressures(env.grid, env.state)
    all_infos = []
    all_p2, all_op = [], []
    done = 0
    policy_carry = getattr(policy_fn, "init_carry", None)
    stateful = policy_carry is not None
    if stateful:
        policy_fn_inner = policy_fn.step_fn
    else:
        policy_fn_inner = policy_fn
    while done < n_steps:
        n = min(log_interval, n_steps - done)
        key, sub = jax.random.split(key)
        env.state, p2, policy_carry, outs = closed_loop_chunk(
            env.grid, env.state, p2, policy_fn_inner, n, sub,
            collect_planes=collect_planes, policy_carry=policy_carry)
        outs = jax.device_get(outs)
        infos = outs[0]
        all_infos.append(infos)
        if collect_planes:
            all_p2.append(outs[1])
            all_op.append(outs[2])
        done += n
        div = infos["drag_reduction/4_1_-|divergence|"]
        if not np.isfinite(div).all() or np.abs(div).max() > div_guard:
            raise RuntimeError(
                f"Control diverged: |div| = {np.abs(div).max():.3f} > "
                f"{div_guard} (or NaN) within steps [{done - n}, {done})")
        if verbose:
            ss = infos["drag_reduction/1_shear_stress"]
            print(f"step {done}/{n_steps}: shear {ss[-1]:.6f} "
                  f"div {div[-1]:.2e}")
        if on_chunk is not None:
            on_chunk(done, infos)

    series = {k: np.concatenate([c[k] for c in all_infos])
              for k in all_infos[0]}
    if env.info_init:
        for k in list(series):
            if "divergence" in k or "drag_reduction" not in k:
                continue
            series[k.replace("drag_reduction",
                             "drag_reduction_relative")] = \
                series[k] / env.info_init[k]
    result = {"series": series}
    if collect_planes:
        result["p2"] = np.concatenate(all_p2)
        result["opV2"] = np.concatenate(all_op)
    return result
