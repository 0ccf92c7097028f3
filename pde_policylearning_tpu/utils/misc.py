"""Misc utilities: parameter counting, timers, seeding, energy spectra.

reference: neuralop/utils.py:66 (count_params), libs/models/utils.py:123
(seeds), :155-200 (timers), libs/parse_npy.py:26 (spectrum2/spectrum3
energy-spectrum utilities).
"""
from __future__ import annotations

import contextlib
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def apply_env_platform():
    """Make the JAX_PLATFORMS env var effective for driver scripts.

    Some images register a TPU plugin from sitecustomize and call
    ``jax.config.update("jax_platforms", ...)`` at interpreter start, which
    silently overrides the env var — ``JAX_PLATFORMS=cpu python driver.py``
    then still initializes (and can hang on) the remote TPU backend.
    Re-applying the env value through the config restores the documented
    env-var contract.  No-op when the var is unset or when its highest-
    priority platform already leads the config value (so the image's
    default "axon,cpu" ordering is left alone under JAX_PLATFORMS=axon).

    Called from each root driver's entry point (NOT at package import:
    scripts that pin a platform programmatically before importing the
    package must not be overridden by a stale env var)."""
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    current = jax.config.jax_platforms or ""
    if current.split(",")[0].strip() != plat.split(",")[0].strip():
        jax.config.update("jax_platforms", plat)


def count_params(params) -> int:
    """Total parameter count of a pytree (neuralop/utils.py:66)."""
    return int(sum(np.prod(p.shape) for p in jax.tree.leaves(params)))


def set_seed(seed: int):
    """Global numpy seeding (libs/models/utils.py:123); JAX randomness is
    explicit via PRNG keys, so this only seeds host-side numpy."""
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


@contextlib.contextmanager
def timer(name: str = "", verbose: bool = True, results: Optional[dict]
          = None):
    """Wall-clock context timer (libs/models/utils.py:155-200)."""
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if results is not None:
        results[name] = dt
    if verbose:
        print(f"[{name}] {dt * 1e3:.2f} ms")


def spectrum2(u, s: Optional[int] = None):
    """Radially-binned 2-D kinetic-energy spectrum (libs/parse_npy.py:26
    spectrum2).  u: (..., s, s) -> (s,) energy per wavenumber shell."""
    u = jnp.asarray(u)
    s = s or u.shape[-1]
    uh = jnp.fft.fft2(u, axes=(-2, -1)) / (s * s)
    energy = 0.5 * jnp.abs(uh) ** 2
    k = jnp.fft.fftfreq(s, d=1.0 / s)
    kmag = jnp.sqrt(k[:, None] ** 2 + k[None, :] ** 2)
    shells = jnp.clip(jnp.round(kmag).astype(jnp.int32), 0, s - 1)
    flat_e = energy.reshape(*energy.shape[:-2], -1)
    flat_s = shells.reshape(-1)
    out = jnp.zeros((*energy.shape[:-2], s), energy.dtype)
    return out.at[..., flat_s].add(flat_e)


def spectrum3(u, s: Optional[int] = None):
    """Radially-binned 3-D energy spectrum (parse_npy.py spectrum3)."""
    u = jnp.asarray(u)
    s = s or u.shape[-1]
    uh = jnp.fft.fftn(u, axes=(-3, -2, -1)) / (s ** 3)
    energy = 0.5 * jnp.abs(uh) ** 2
    k = jnp.fft.fftfreq(s, d=1.0 / s)
    kmag = jnp.sqrt(k[:, None, None] ** 2 + k[None, :, None] ** 2
                    + k[None, None, :] ** 2)
    shells = jnp.clip(jnp.round(kmag).astype(jnp.int32), 0, s - 1)
    flat_e = energy.reshape(*energy.shape[:-3], -1)
    flat_s = shells.reshape(-1)
    out = jnp.zeros((*energy.shape[:-3], s), energy.dtype)
    return out.at[..., flat_s].add(flat_e)
