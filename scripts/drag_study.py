"""Drag-reduction study over the FULL policy zoo (VERDICT r3 item 10).

50k steps from the packaged developed-turbulence IC, tail-mean wall shear
(last half) vs unmanipulated.  Protocol identical to the round-2 study
(NOTES_r2 'Drag-reduction study'); this run adds the RNO and transformer
observer policies and the online-adapted PolicyModel2D
('optimal-policy-observer', reference run_control.py:162-185).

Resumable: each policy's series is cached as outputs/drag_study/<name>.npz.

Partial banking (round 5): the gradient rows run hours on the tunnel-flaky
chip, so every heartbeat chunk also writes <name>.partial.npz (the longest
self-consistent single-run series so far).  A wedge/kill therefore never
loses a row: the partial can be promoted to the final artifact
(DRAG_PROMOTE=row1,row2) and its tail-mean reported with the banked step
count.  DRAG_DEADLINE=<epoch secs> makes a row stop cleanly at the wall
and self-promote whatever it has.

Usage:  python scripts/drag_study.py [n_steps]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The round-5 study started on the staged RK3 kernels before kernel D
# became the package default (rk3_pallas.FULLSTEP); pin the staged path so
# every row of the table ran identical numerics.  Explicit env overrides
# still win.
os.environ.setdefault("PDE_RK3_FULLSTEP", "0")

import jax
import jax.numpy as jnp
import numpy as np

from pde_policylearning_tpu import models
from pde_policylearning_tpu.control import (make_optimal_policy_observer,
                                            make_policy, run_closed_loop)
from pde_policylearning_tpu.data import PDEDataset
from pde_policylearning_tpu.envs import NSControlEnv
from pde_policylearning_tpu.training import load_msgpack

N_STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
OUT = "outputs/drag_study"
DATA = "data/planes_channel180_minchan"
SHEAR = "drag_reduction/1_shear_stress"
os.makedirs(OUT, exist_ok=True)


def dataset():
    total = len([f for f in os.listdir(DATA) if f.startswith("P_plane")])
    return PDEDataset.from_folder(DATA, np.arange(min(100, total)))


def fresh_env():
    return NSControlEnv(detect_plane=25, test_plane=124, seed=0)


def observer_policy(name, env, ds):
    Nx, Nz = env.grid.Nx, env.grid.Nz
    if name == "fno":
        model = models.FNO2dObserver(modes1=12, modes2=12, width=32)
        ckpt = "outputs/planes_channel180_minchan_31-FNO-reproduce.msgpack"
        x0 = jnp.zeros((1, Nx, Nz, 1))
    elif name == "rno":
        model = models.RNO2dObserver(modes1=12, modes2=12, width=34,
                                     layer_num=1)
        ckpt = "outputs/planes_channel180_minchan_rno-observer.msgpack"
        x0 = jnp.zeros((1, 2, Nx, Nz, 1))
    else:
        model = models.SimpleTransformer(n_hidden=96, n_head=2,
                                         attention_type="fourier",
                                         freq_dim=48, fourier_modes=12)
        ckpt = "outputs/planes_channel180_minchan_6-Transformer-based.msgpack"
        x0 = jnp.zeros((1, 2, Nx, Nz, 1))
    # template load: adapts legacy dense-weight layouts (checkpoint.py)
    tmpl = jax.jit(model.init)(jax.random.PRNGKey(0), x0)["params"]
    params = load_msgpack(ckpt, tmpl)
    return make_policy(name, env.grid, detect_plane=25, model=model,
                       params=params, p_norm=ds.p_norm, v_norm=ds.v_norm,
                       model_timestep=2, action_scale=0.3, action_clip=0.01)


def fullfield_observer(env):
    """Reference-scale full-field PI observer + checkpoint if trained
    (run_pde_observers.py:104-107: modes [12]*4, layers [64]*5, fc_dim 128
    — must match configs/fullfield_pi.yaml)."""
    obs = models.PINObserverFullField(
        plane_num=3, modes1=(12,) * 4, modes2=(12,) * 4,
        modes3=(12,) * 4, layers=(64,) * 5, fc_dim=128, in_dim=1,
        pad_ratio=(0.0, 0.0625))
    x0 = jnp.zeros((1, env.grid.Nx, env.grid.Nz, 1, 1))
    re0 = jnp.ones((1,))
    obs_ckpt = "outputs/planes_channel180_minchan_fullfield-pi.msgpack"
    # startup progress markers: this phase is minutes-long (906 MB ckpt
    # read + device_put through the tunnel + jitted init) and otherwise
    # silent, which the babysitter can't tell from a tunnel wedge
    print("  [setup] observer init...", flush=True)
    tmpl = jax.jit(obs.init)(jax.random.PRNGKey(0), x0, re0)["params"]
    if os.path.exists(obs_ckpt):
        print("  [setup] loading fullfield ckpt...", flush=True)
        loaded = load_msgpack(obs_ckpt, tmpl)
        print("  [setup] device_put...", flush=True)
        # one bulk device_put: msgpack gives host numpy leaves, and host
        # args re-upload ~906 MB through the tunnel at every dispatch
        obs_params = jax.device_put(loaded)
        jax.block_until_ready(obs_params)
        print("  [setup] observer params on device", flush=True)
        tag = "trained-fullfield"
    else:
        obs_params = tmpl
        tag = "randinit-fullfield"
    return obs, obs_params, tag


def optimal_observer_policy(env):
    """'optimal-observer' (reference run_control.py:186-224): inner Adam
    directly on opV2 through the frozen full-field observer."""
    from pde_policylearning_tpu.control import \
        make_fullfield_optimal_observer
    from pde_policylearning_tpu.ops.normalization import \
        NormalizerGivenMeanStd
    obs, obs_params, tag = fullfield_observer(env)
    meta = np.load("data/planes_channel180_fullfield/metadata.npy",
                   allow_pickle=True).tolist()
    v_mean = np.asarray(meta["V_field"]["mean"])
    v_std = np.asarray(meta["V_field"]["std"])
    norm = NormalizerGivenMeanStd(jnp.asarray(v_mean[:, -1, :]),
                                  jnp.asarray(v_std[:, -1, :]))
    return make_fullfield_optimal_observer(
        env.grid, observer_model=obs, observer_params=obs_params,
        bound_v_norm=norm, detect_plane=25), tag


def policy_model_policy(env):
    """Online-adapted zero-init PolicyModel2D through a full-field PINO
    observer (trained by run_pde_observers.py main_fullfield if its
    checkpoint exists; random-init otherwise, recorded as such)."""
    obs, obs_params, tag = fullfield_observer(env)
    x0 = jnp.zeros((1, env.grid.Nx, env.grid.Nz, 1, 1))
    re0 = jnp.ones((1,))
    pol = models.PolicyModel2D(modes1=(12,) * 4, modes2=(12,) * 4,
                               modes3=(12,) * 4, layers=(64,) * 5,
                               fc_dim=128, in_dim=1)
    # jitted init: eager init on axon dispatches thousands of per-op RPCs
    # at this scale and can crash the remote worker (CLAUDE.md invariant)
    print("  [setup] policy init...", flush=True)
    pol_params = jax.jit(pol.init)(jax.random.PRNGKey(1), x0, re0)["params"]
    pol_params = jax.jit(pol.zero_init_params)(pol_params)
    print("  [setup] policy ready; entering closed loop", flush=True)
    return make_optimal_policy_observer(
        env.grid, observer_model=obs, observer_params=obs_params,
        policy_model=pol, policy_params=pol_params, detect_plane=25), tag


def ddpg_policy(env):
    """Trained on-device DDPG actor (beyond the reference, which leaves
    its DDPG demo unwired; main_ddpg.py --channel trains it)."""
    from pde_policylearning_tpu.control.ddpg import (Actor,
                                                     make_ddpg_policy)
    ckpt = "outputs/ddpg_channel_actor.msgpack"
    Nx, Nz = env.grid.Nx, env.grid.Nz
    actor = Actor(Nx * Nz, max_action=0.01)
    tmpl = jax.jit(actor.init)(jax.random.PRNGKey(0),
                               jnp.zeros((1, Nx * Nz)))["params"]
    params = load_msgpack(ckpt, tmpl)
    return make_ddpg_policy(params, Nx, Nz)


DEADLINE = float(os.environ.get("DRAG_DEADLINE", "0")) or None


class _Deadline(Exception):
    """Raised from the heartbeat when DRAG_DEADLINE passes: the partial
    banked so far is promoted and reported instead of losing the row."""


def _tail(shear):
    return float(np.mean(shear[len(shear) // 2:]))


def run(name):
    cache = os.path.join(OUT, f"{name}.npz")
    partial = os.path.join(OUT, f"{name}.partial.npz")
    if os.path.exists(cache):
        d = np.load(cache)
        return _tail(d["shear"])
    env = fresh_env()
    ds = dataset() if name in ("fno", "rno", "transformer") else None
    tag = name
    log_interval = 2000
    if name in ("unmanipulated", "gt", "rand"):
        pol = make_policy(name, env.grid, detect_plane=25, rand_scale=1.0)
    elif name in ("fno", "rno", "transformer"):
        pol = observer_policy(name, env, ds)
    elif name == "ddpg":
        pol = ddpg_policy(env)
    elif name == "optimal-policy-observer":
        pol, tag = policy_model_policy(env)
        # gradient-through-observer chunks run ~100x longer per step than
        # the plain rows; a 2000-step chunk is a single multi-hundred-
        # second device execution and reproducibly crashes the axon TPU
        # worker (round 5, twice).  250-step chunks match the proven
        # opo_probe stage-3 dispatch size.
        log_interval = 250
    elif name == "optimal-observer":
        pol, tag = optimal_observer_policy(env)
        log_interval = 250
    t0 = time.time()
    # a retried row starts a NEW trajectory from step 0; only overwrite the
    # banked partial once this run is the longest self-consistent series
    best_prev = 0
    if os.path.exists(partial):
        best_prev = int(np.load(partial)["steps"])
    parts = []

    # heartbeat: one line per chunk so an external babysitter can tell a
    # healthy long row from a wedged tunnel (log-mtime staleness); each
    # chunk also banks the series so far (partial npz) and honours the
    # deadline wall
    def _cb(done, infos):
        parts.append(np.asarray(infos[SHEAR]))
        print(f"  [{name} {done}/{N_STEPS}] shear {infos[SHEAR][-1]:.4e}",
              flush=True)
        if done > best_prev:
            np.savez(partial, shear=np.concatenate(parts), tag=tag,
                     steps=done)
        if DEADLINE and time.time() > DEADLINE:
            raise _Deadline(f"{name} hit DRAG_DEADLINE at {done} steps")

    try:
        res = run_closed_loop(env, pol, n_steps=N_STEPS,
                              log_interval=log_interval,
                              detect_plane=25, div_guard=1e9, verbose=False,
                              on_chunk=_cb)
        shear = np.asarray(res["series"][SHEAR])
        np.savez(cache, shear=shear, tag=tag, steps=len(shear))
        if os.path.exists(partial):
            os.remove(partial)
    except _Deadline as e:
        print(f"  [{name}] {e}; promoting partial", flush=True)
        os.replace(partial, cache)
        shear = np.load(cache)["shear"]
    tail = _tail(shear)
    print(f"{name:26s} [{tag}] tail-mean shear {tail:.6e} over "
          f"{len(shear)} steps ({time.time() - t0:.0f}s)", flush=True)
    return tail


def main():
    names = ["unmanipulated", "gt", "rand", "fno", "rno", "transformer",
             "optimal-policy-observer", "optimal-observer"]
    if os.path.exists("outputs/ddpg_channel_actor.msgpack"):
        names.append("ddpg")
    only = os.environ.get("DRAG_ONLY")
    if only:   # targeted re-runs: DRAG_ONLY=optimal-observer,ddpg
        names = [n for n in names if n in only.split(",")]
    for n in os.environ.get("DRAG_PROMOTE", "").split(","):
        # bank a killed row's partial as its final artifact (round end)
        p = os.path.join(OUT, f"{n}.partial.npz")
        if n and os.path.exists(p) and \
                not os.path.exists(os.path.join(OUT, f"{n}.npz")):
            os.replace(p, os.path.join(OUT, f"{n}.npz"))
            print(f"promoted partial -> {n}.npz", flush=True)
    results, steps = {}, {}
    for n in names:
        try:
            results[n] = run(n)
        except Exception as e:  # divergence etc.: record and continue
            print(f"{n}: FAILED — {type(e).__name__}: {e}", flush=True)
            results[n] = None
        cache = os.path.join(OUT, f"{n}.npz")
        if results[n] is not None and os.path.exists(cache):
            steps[n] = len(np.load(cache)["shear"])
    base = results.get("unmanipulated")
    print("\n| policy | tail-mean shear | vs unmanipulated | steps |")
    print("|---|---|---|---|")
    for n in names:
        v = results[n]
        if v is None:
            print(f"| {n} | diverged/failed | — | — |")
        elif base:
            s = steps.get(n, N_STEPS)
            note = f"{s}" if s >= N_STEPS else f"{s} (budget-bounded)"
            print(f"| {n} | {v:.3e} | {100 * (v - base) / base:+.1f}% "
                  f"| {note} |")
    with open(os.path.join(OUT, "summary.json"), "w") as f:
        json.dump({"tail_mean": results, "steps": steps}, f, indent=1)


if __name__ == "__main__":
    main()
