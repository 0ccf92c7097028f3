"""Closed-loop control rollout, fully on device.

reference: run_control.py:135-316 (the sequential control loop).  The
observe -> policy -> actuate -> score cycle is one `lax.scan` body; the wall
pressure rides in the carry so each step runs exactly one pressure solve.
Host interaction is one fetch per chunk (for logging + the divergence guard,
run_control.py:294-295).
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..envs import channel_flow as cf

_boundary_pressures_jit = jax.jit(cf.boundary_pressures)

# The scoreboard schema is static (step_metrics / rk3_pallas.env_step_k
# emit the same 9 keys); the jitted chunk returns the series as ONE
# stacked (9, n) array so the per-chunk host fetch is a single transfer.
# On the remote-attached tunnel, jax.device_get of a 9-leaf dict costs 9
# sequential round trips (~90 ms) — 21% of a 2000-step bench run.
_SCOREBOARD_KEYS = (
    "drag_reduction/1_shear_stress",
    "drag_reduction/2_1_mass_flow",
    "drag_reduction/2_2_v_velocity",
    "drag_reduction/2_3_w_velocity",
    "drag_reduction/3_1_pressure_mean",
    "drag_reduction/3_2_dPdx_finite_difference",
    "drag_reduction/3_3_dPdx_reverse_cal",
    "drag_reduction/4_1_-|divergence|",
    "drag_reduction/4_4_speed_norm",
)


@partial(jax.jit, static_argnames=("policy_fn", "n_steps", "collect_planes",
                                   "detect_plane"))
def closed_loop_chunk(grid, state, p2, policy_fn: Callable, n_steps: int,
                      key, collect_planes: bool = False, policy_carry=None,
                      detect_plane: int = 25):
    """Run `n_steps` control steps in one jitted scan.

    Returns a 5-tuple ``(state, p2, policy_carry, key, outs)``.  Round 4
    inserted the advanced PRNG ``key`` before ``outs`` (previously a
    4-tuple): callers that unpacked 4 values must add the key slot.
    ``outs[0]`` is the (9, n_steps) scoreboard matrix in _SCOREBOARD_KEYS
    order; with ``collect_planes`` the p2/opV2/v_plane series follow.
    """
    # Chain the key INSIDE the jit: the caller passes the running key and
    # gets the advanced one back, so the host loop issues zero eager
    # jax.random ops (each eager op is a tunnel RPC on axon, NOTES_r4).
    key, sub = jax.random.split(key)
    stateful = policy_carry is not None
    # Fused TPU path: carry the state in the Pallas kernels' (y, x*z)
    # layout across the WHOLE scan — per-step layout flips around the
    # kernels are the round-2 9x-regression failure mode.  Policies see
    # the kernel-layout state (gt_control handles it; observer policies
    # only read p2) and (Nx, Nz) pressure planes.
    fused = cf._rk3_fused_eligible(state.U)
    if fused:
        from ..envs import rk3_pallas as rk
        in_dtype = state.U.dtype
        state = rk.state_to_kstate(state)

    def body(carry, k):
        st, p2_obs, pc = carry
        if stateful:
            opV1, opV2, pc = policy_fn(pc, st, p2_obs, k)
        else:
            opV1, opV2 = policy_fn(st, p2_obs, k)
        if fused:
            from ..envs import rk3_pallas as rk
            st, p2_next, info = rk.env_step_k(grid, st, opV1, opV2)
            v_plane = st.V[st.V.shape[0] - detect_plane].reshape(
                grid.Nx, grid.Nz)
        else:
            st = cf.rk3_step(grid, st, opV1, opV2)
            _, p2_next = cf.boundary_pressures(grid, st)
            info = cf.step_metrics(grid, st, p2_next)
            v_plane = st.V[:, -detect_plane, :]
        # Stack the 9 scoreboard scalars into ONE (9,) vector here so the
        # scan writes a single ys row per step instead of 9 separate
        # per-key scalar updates (9 tiny HBM transactions per step).
        info_vec = jnp.stack([info[k] for k in _SCOREBOARD_KEYS])
        if collect_planes:
            out = (info_vec, p2_next, opV2.reshape(grid.Nx, grid.Nz),
                   v_plane)
        else:
            out = (info_vec,)
        return (st, p2_next, pc), out

    keys = jax.random.split(sub, n_steps)
    (state, p2, policy_carry), outs = jax.lax.scan(
        body, (state, p2, policy_carry), keys)
    if fused:
        from ..envs import rk3_pallas as rk
        state = rk.kstate_to_state(grid, state, in_dtype)
    info_mat = outs[0].T  # (n, 9) scan rows -> (9, n) series
    return state, p2, policy_carry, key, (info_mat,) + outs[1:]


def run_closed_loop(env, policy_fn, n_steps: int,
                    log_interval: int = 200,
                    div_guard: float = 10.0,
                    collect_planes: bool = False,
                    detect_plane: int = 25,
                    seed: int = 0,
                    verbose: bool = True,
                    on_chunk=None):
    """Drive `env` with `policy_fn` for n_steps; returns the metric time
    series (and optionally the collected p2/opV2 planes).

    Aborts (raises RuntimeError) if |divergence| exceeds `div_guard`,
    mirroring run_control.py:294-295.
    """
    key = jax.random.PRNGKey(seed)
    # jit the one-off observation: eagerly it dispatches dozens of ops (or
    # an eager pallas call + layout transposes) through the remote tunnel,
    # costing seconds per run_closed_loop call on axon.  Reuse the p2 the
    # previous run_closed_loop computed for this exact state object (states
    # are immutable pytrees, replaced wholesale) — back-to-back runs (bench
    # medians) otherwise pay a redundant pressure solve + dispatch RPC each.
    # Identity-caching contract: valid only because (a) state leaves are jax
    # arrays, never mutated in place — env.state is replaced wholesale by
    # reset/add_random_noise/this loop — and (b) an env's grid is fixed for
    # its lifetime.  A future mutable-state or grid-swapping env must drop
    # the cache instead of inheriting it.
    cached = getattr(env, "_p2_cache", None)
    if cached is not None and cached[0] is env.state:
        p2 = cached[1]
    else:
        # release a stale entry promptly: it pins the previous run's full
        # state pytree (U/V/W) + p2 in device HBM until the next success
        env._p2_cache = None
        _, p2 = _boundary_pressures_jit(env.grid, env.state)
    all_infos = []
    all_p2, all_op = [], []
    done = 0
    policy_carry = getattr(policy_fn, "init_carry", None)
    stateful = policy_carry is not None
    if stateful:
        policy_fn_inner = policy_fn.step_fn
    else:
        policy_fn_inner = policy_fn
    all_v = []
    while done < n_steps:
        n = min(log_interval, n_steps - done)
        env.state, p2, policy_carry, key, outs = closed_loop_chunk(
            env.grid, env.state, p2, policy_fn_inner, n, key,
            collect_planes=collect_planes, policy_carry=policy_carry,
            detect_plane=detect_plane)
        outs = jax.device_get(outs)
        infos = dict(zip(_SCOREBOARD_KEYS, outs[0]))
        all_infos.append(infos)
        if collect_planes:
            all_p2.append(outs[1])
            all_op.append(outs[2])
            all_v.append(outs[3])
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

    env._p2_cache = (env.state, p2)
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
        result["v_plane"] = np.concatenate(all_v)
    return result


def save_collected_dataset(result: dict, out_folder: str,
                           re: float = 178.1899):
    """Write a collected control run in the trainable on-disk format
    (P_planes/V_planes per step + metadata.npy), matching
    data/channel.generate_channel_dataset and the reference's collection
    loop (run_control.py:236-293)."""
    import os
    os.makedirs(out_folder, exist_ok=True)
    p2 = result["p2"]
    v = result["v_plane"]
    for i in range(len(p2)):
        np.save(os.path.join(out_folder, f"P_planes_{i:06d}.npy"), p2[i])
        np.save(os.path.join(out_folder, f"V_planes_{i:06d}.npy"), v[i])
    meta = {
        "P_planes": {"mean": p2.mean(0), "std": p2.std(0) + 1e-8},
        "V_planes": {"mean": v.mean(0), "std": v.std(0) + 1e-8},
        "re": re,
    }
    np.save(os.path.join(out_folder, "metadata.npy"), meta)
    return out_folder
