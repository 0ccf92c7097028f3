"""Profiling and tracing utilities.

reference: ProfileResult — torch.autograd.profiler text-dump parser into
CPU/CUDA time, memory, GFLOPS tables (libs/models/utils_ft.py:861-963);
pympler memory summaries (run_control.py:22-23).

TPU-native replacement: `jax.profiler` traces viewable in XProf/Perfetto,
plus a compile-free benchmarking harness (block_until_ready timing with
warmup) and a FLOP estimate from XLA's cost analysis.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a device trace for XProf/Perfetto (jax.profiler)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def benchmark(fn: Callable, *args, warmup: int = 2, iters: int = 20,
              **kwargs) -> dict:
    """Time a jitted callable with correct async semantics: one
    block_until_ready at the end of the measured loop (device->host syncs
    are very expensive on remote-attached devices — see
    .claude/skills/verify/SKILL.md)."""
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return {"mean_ms": dt * 1e3, "iters_per_s": 1.0 / dt}


def flop_estimate(fn: Callable, *args, **kwargs) -> Optional[float]:
    """FLOP count from XLA cost analysis of the lowered computation
    (the GFLOPS column of the reference's ProfileResult)."""
    try:
        lowered = jax.jit(fn).lower(*args, **kwargs)
        compiled = lowered.compile()
        analysis = compiled.cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops", float("nan")))
    except Exception:
        return None


def profile_result(fn: Callable, *args, warmup: int = 2, iters: int = 20,
                   **kwargs) -> dict:
    """One-stop profile: wall time + FLOPs + achieved GFLOP/s (the
    ProfileResult table equivalent, utils_ft.py:861-963)."""
    stats = benchmark(fn, *args, warmup=warmup, iters=iters, **kwargs)
    flops = flop_estimate(fn, *args, **kwargs)
    if flops:
        stats["flops"] = flops
        stats["gflops_per_s"] = flops / (stats["mean_ms"] * 1e-3) / 1e9
    return stats


def memory_summary() -> str:
    """Device memory summary (pympler-summary equivalent for HBM)."""
    try:
        stats = jax.devices()[0].memory_stats()
        if not stats:
            return "no memory stats available"
        lines = [f"{k}: {v / 1e6:.1f} MB" if "bytes" in k else f"{k}: {v}"
                 for k, v in sorted(stats.items())]
        return "\n".join(lines)
    except Exception as e:  # backend without memory_stats
        return f"memory stats unavailable: {e}"
