"""Domain padding for non-periodic inputs.

reference: neuralop/models/padding.py:4 (DomainPadding).  The reference caches
per-resolution pad configs in a dict at runtime; under `jit` shapes are static
so this is simply a pure function pair — no cache needed.

Layout: channels-last (B, d1..dN, C); padding applies to the spatial axes.
"""
from __future__ import annotations

from typing import Union

import jax.numpy as jnp

Scalar = Union[float, int]


def _resolve(domain_padding, resolution):
    if isinstance(domain_padding, (float, int)):
        domain_padding = [float(domain_padding)] * len(resolution)
    return [int(round(p * r)) for p, r in zip(domain_padding, resolution)]


def pad_domain(x: jnp.ndarray, domain_padding, mode: str = "one-sided") -> jnp.ndarray:
    """Zero-pad each spatial axis by a fraction of its resolution."""
    resolution = x.shape[1:-1]
    amounts = _resolve(domain_padding, resolution)
    mode = mode.lower()
    if mode == "symmetric":
        pads = [(0, 0)] + [(p, p) for p in amounts] + [(0, 0)]
    elif mode == "one-sided":
        pads = [(0, 0)] + [(0, p) for p in amounts] + [(0, 0)]
    else:
        raise ValueError(f"Got padding mode {mode!r}")
    return jnp.pad(x, pads)


def unpad_domain(x: jnp.ndarray, domain_padding, mode: str = "one-sided",
                 output_scaling_factor=None) -> jnp.ndarray:
    """Inverse of `pad_domain`.

    `output_scaling_factor`: if the model rescaled the (padded) domain, the
    pad amounts to strip scale accordingly (padding.py:57-63).
    The *unpadded* original resolution is recovered from the padded input.
    """
    resolution = x.shape[1:-1]
    mode = mode.lower()
    if isinstance(domain_padding, (float, int)):
        domain_padding = [float(domain_padding)] * len(resolution)
    if output_scaling_factor is None:
        output_scaling_factor = [1.0] * len(resolution)
    elif isinstance(output_scaling_factor, (float, int)):
        output_scaling_factor = [float(output_scaling_factor)] * len(resolution)

    # padded_size = (orig + k*pad) * scale  with k=1 (one-sided) or 2
    k = 2 if mode == "symmetric" else 1
    idx = [slice(None)]
    for size, frac, scale in zip(resolution, domain_padding, output_scaling_factor):
        orig = int(round(size / scale / (1 + k * frac)))
        pad = int(round(frac * orig * scale))
        if pad == 0:
            idx.append(slice(None))
        elif mode == "symmetric":
            idx.append(slice(pad, -pad))
        else:
            idx.append(slice(None, -pad))
    idx.append(slice(None))
    return x[tuple(idx)]
