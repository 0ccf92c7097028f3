"""Headline benchmark: closed-loop channel-flow control throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: env-steps/sec of the full closed loop (opposition policy + RK3 DNS
step + wall-pressure observation + scoreboard metrics) at the reference
configuration (32x130x32 grid, Re_tau~180), on one TPU chip.

Baseline: the reference implementation's per-step dominant cost measured on
this machine's CPU via its own algorithmic structure — 4 projection/pressure
solves per step, each a Python double loop of 1024 torch.linalg.solve calls
on 129x129 complex systems (control_env.py:593-602, compute_pressure_py:196)
— giving 0.33 steps/s (torch 2.x, this container).  The reference has no
published numbers (BASELINE.md).
"""
from __future__ import annotations

import json
import sys
import time

REFERENCE_STEPS_PER_S = 0.33  # measured proxy, see module docstring


def _fail(exc) -> None:
    """Emit one parseable JSON line on any failure (VERDICT.md r1 item 8):
    an infra-down round must still yield a machine-readable artifact."""
    import traceback

    traceback.print_exc(file=sys.stderr)
    print(json.dumps({
        "metric": "closed_loop_env_steps_per_sec",
        "value": None,
        "unit": "steps/s",
        "vs_baseline": None,
        "error": f"{type(exc).__name__}: {exc}",
    }))


def main():
    import jax
    import numpy as np

    from pde_policylearning_tpu.control import make_policy, run_closed_loop
    from pde_policylearning_tpu.envs import NSControlEnv

    print("constructing env...", file=sys.stderr)
    env = NSControlEnv(Nx=32, Ny=130, Nz=32, detect_plane=25,
                       noise_scale=0.05, seed=0, spinup_steps=0)
    policy = make_policy("gt", env.grid, detect_plane=25)

    # warm up / compile with the SAME chunk length as the measured run
    # (scan length is a static shape — different lengths recompile).
    # n matches the reference's control budget (configs/matlab_rno.yaml
    # control_timestep: 2000) and amortizes the per-run host fetch, whose
    # fixed ~0.5 s tunnel latency dominates short runs.
    n = 2000
    run_closed_loop(env, policy, n_steps=n, log_interval=n, verbose=False)

    # Median of 3 timed runs: identical code measures +-25% across single
    # runs on this shared-host tunnel (NOTES_r2), so one sample cannot
    # distinguish a real 15% regression from noise (VERDICT r2 weak #4).
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        run_closed_loop(env, policy, n_steps=n, log_interval=n, verbose=False)
        dt = time.perf_counter() - t0
        runs.append(round(n / dt, 2))
    steps_per_s = sorted(runs)[len(runs) // 2]

    print(json.dumps({
        "metric": "closed_loop_env_steps_per_sec",
        "value": steps_per_s,
        "unit": "steps/s",
        "vs_baseline": round(steps_per_s / REFERENCE_STEPS_PER_S, 1),
        "runs": runs,
    }))


def guarded_main():
    try:
        main()
    except BaseException as exc:  # noqa: BLE001 — must always emit JSON
        if isinstance(exc, SystemExit):
            raise
        _fail(exc)
        sys.exit(1)


if __name__ == "__main__":
    # Watchdog: a hung device tunnel would otherwise block forever and the
    # round would record nothing.  Run the measurement in a child process
    # with a hard timeout; propagate its stdout (the single JSON line).
    import multiprocessing as mp
    import os

    if os.environ.get("BENCH_NO_WATCHDOG"):
        guarded_main()
    else:
        ctx = mp.get_context("spawn")
        proc = ctx.Process(target=guarded_main)
        proc.start()
        proc.join(timeout=1800)
        if proc.is_alive():
            proc.terminate()
            proc.join(5)
            print("bench timed out: device unreachable", file=sys.stderr)
            print(json.dumps({
                "metric": "closed_loop_env_steps_per_sec",
                "value": None,
                "unit": "steps/s",
                "vs_baseline": None,
                "error": "TimeoutError: device unreachable after 1800s",
            }))
            sys.exit(1)
        sys.exit(proc.exitcode or 0)
