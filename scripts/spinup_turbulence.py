"""Spin up developed channel turbulence and checkpoint the snapshot.

The reference ships a developed-turbulence state (channel180_minchan.mat,
loaded at control_env.py:149-180) and starts every experiment from it.  This
script generates our equivalent: trip transition from a Reichardt profile +
streamwise vortices, advance the DNS in on-device chunks until the wall
shear statistics equilibrate around u_tau^2 (Re_tau ~ 180), then save the
snapshot to pde_policylearning_tpu/data/assets/channel180_minchan_tpu.npz.

Run on the real TPU: python scripts/spinup_turbulence.py
(~1 ms/step -> ~7 min for the default 400k steps = 23 eddy turnovers).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pde_policylearning_tpu.envs import channel_flow as cf  # noqa: E402

CHUNK = 20_000
MAX_CHUNKS = 30          # 600k steps hard cap
MIN_CHUNKS = 10          # >= 200k steps (~11 turnovers) before convergence test
OUT = os.path.join(os.path.dirname(__file__), "..",
                   "pde_policylearning_tpu", "data", "assets",
                   "channel180_minchan_tpu.npz")


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    grid = cf.make_channel_grid()
    utau2 = cf.DEFAULT_DPDX
    state = cf.init_turbulent_state(grid, jax.random.PRNGKey(7))
    print(f"target tau_w = utau^2 = {utau2:.4e}; "
          f"bulk target = {float(state.meanU0):.4f}", file=sys.stderr)

    history = []
    t_start = time.time()
    for i in range(MAX_CHUNKS):
        t0 = time.time()
        state, stats = cf.spinup_chunk(grid, state, CHUNK)
        stats = np.asarray(stats)          # (CHUNK, 4) single fetch
        dt = time.time() - t0
        if not np.isfinite(stats).all():
            print("DIVERGED at chunk", i, file=sys.stderr)
            sys.exit(1)
        tail = stats[-CHUNK // 2:]
        tau_b, tau_t, bulk, dpdx = tail.mean(axis=0)
        history.append([float(tau_b), float(tau_t), float(bulk), float(dpdx)])
        print(f"chunk {i:2d} ({CHUNK} steps, {CHUNK / dt:6.0f} steps/s): "
              f"tau_b={tau_b:.4e} tau_t={tau_t:.4e} (target {utau2:.4e}) "
              f"bulk={bulk:.4f} dPdx={dpdx:.4e}", file=sys.stderr)

        # converged: last three chunk means of wall shear are (a) in the
        # turbulent band (well above the laminar value 3 nu Ub / h) and
        # (b) mutually within 15%
        if i + 1 >= MIN_CHUNKS:
            taus = np.array(history[-3:])[:, :2].mean(axis=1)
            lam = 3 * grid.nu * bulk
            in_band = np.all(taus > 2.0 * lam) and np.all(
                np.abs(taus / utau2 - 1.0) < 0.5)
            flat = np.abs(taus / taus.mean() - 1.0).max() < 0.15
            if in_band and flat:
                print("converged.", file=sys.stderr)
                break

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(
        OUT,
        U=np.asarray(state.U, np.float32),
        V=np.asarray(state.V, np.float32),
        W=np.asarray(state.W, np.float32),
        dPdx=np.asarray(state.dPdx, np.float32),
        meanU0=np.asarray(state.meanU0, np.float32),
        nu=np.float32(grid.nu),
        steps=np.int64((i + 1) * CHUNK),
        history=np.asarray(history, np.float32),
    )
    print("saved", OUT, f"({os.path.getsize(OUT) / 1e6:.2f} MB, "
          f"{time.time() - t_start:.0f}s total)", file=sys.stderr)
    print(json.dumps({"chunks": i + 1, "tau_b": history[-1][0],
                      "tau_t": history[-1][1], "bulk": history[-1][2],
                      "target_tau": utau2}))


if __name__ == "__main__":
    main()
