"""Spectral convolution core ops (channels-last, XLA/TPU-first).

The N-D factorized spectral convolution: rfftn -> truncated-corner complex
contraction -> irfftn (reference: neuralop/models/spectral_convolution.py:143,
303-347).  Re-designed for TPU:

* channels-last ``(B, d1..dN, C)`` activations so the channel contraction is
  the innermost (lane) dimension and maps onto the MXU;
* the reference zero-fills the full output spectrum and scatter-writes each
  corner (`out_fft[idx] = ...`) — a pattern XLA tiles poorly.  Here each
  contracted corner is placed with a static `jax.lax.pad` and the (<=4)
  padded spectra are summed; XLA fuses this into the irfft input.
* no data-dependent shapes anywhere: mode counts are static Python ints.
"""
from __future__ import annotations

import itertools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from . import factorized


def rfftn(x: jnp.ndarray, axes, norm: str = "backward") -> jnp.ndarray:
    """rfftn with *static* normalization.

    jnp.fft's `norm=` kwarg materializes the scale as a device-side int
    reduction, which the TPU runtime rejects in eager mode (observed:
    UNIMPLEMENTED on v5e).  Shapes are static under jit anyway, so the
    scale is a Python float folded into the graph for free.
    """
    out = jnp.fft.rfftn(x, axes=axes)
    if norm == "backward":
        return out
    n = 1
    for a in axes:
        n *= x.shape[a]
    if norm == "forward":
        return out * (1.0 / n)
    if norm == "ortho":
        return out * (1.0 / n ** 0.5)
    raise ValueError(f"Unknown fft norm {norm!r}")


def irfftn(x_ft: jnp.ndarray, s, axes, norm: str = "backward") -> jnp.ndarray:
    out = jnp.fft.irfftn(x_ft, s=tuple(s), axes=axes)
    if norm == "backward":
        return out
    n = 1
    for size in s:
        n *= size
    if norm == "forward":
        return out * float(n)
    if norm == "ortho":
        return out * (n ** 0.5)
    raise ValueError(f"Unknown fft norm {norm!r}")


def corner_slices(half_modes: Sequence[int]) -> list[tuple[slice, ...]]:
    """Spectral-corner slice tuples over the mode axes, in the reference's
    weight enumeration order (spectral_convolution.py:330-337): the last
    (rfft) axis keeps only low modes; every other axis contributes a
    (low, high) pair, enumerated with itertools.product."""
    per_dim = [
        ((slice(None, m)), (slice(-m, None))) for m in half_modes[:-1]
    ] + [(slice(None, half_modes[-1]),)]
    return [tuple(c) for c in itertools.product(*per_dim)]


def _pad_config(corner: tuple[slice, ...], spectrum_shape: Sequence[int]):
    """lax.pad config placing a corner block back into the full spectrum."""
    cfg = []
    for sl, full in zip(corner, spectrum_shape):
        if sl.start is None:  # low corner [:m]
            m = sl.stop
            cfg.append((0, full - m, 0))
        else:  # high corner [-m:]
            m = -sl.start
            cfg.append((full - m, 0, 0))
    return cfg


def slice_weight_modes(params: dict, half_modes: Sequence[int],
                       separable: bool = False) -> dict:
    """Restrict a factorized weight to its first `half_modes` modes per axis
    (the `incremental_n_modes` mechanism,
    reference: spectral_convolution.py:286-301)."""
    order = len(half_modes)
    kind = factorized.factorization_of(params)
    if kind == "dense":
        t = params["tensor"]  # (2, I[, O], m1..mN)
        idx = (slice(None),) * (t.ndim - order) + tuple(
            slice(None, m) for m in half_modes)
        return {"tensor": t[idx]}
    if kind == "tucker":
        factors = list(params["factors"])
        for k, m in enumerate(half_modes):
            f = factors[-order + k]
            factors[-order + k] = f[:, :m, :]
        return {"core": params["core"], "factors": factors}
    if kind == "cp":
        factors = list(params["factors"])
        for k, m in enumerate(half_modes):
            f = factors[-order + k]
            factors[-order + k] = f[:, :m, :]
        return {"lambda": params["lambda"], "factors": factors}
    factors = list(params["factors"])
    for k, m in enumerate(half_modes):
        f = factors[-order + k]
        factors[-order + k] = f[:, :, :m, :]
    return {"factors": factors}


def spectral_conv_nd(
    x: jnp.ndarray,
    weights: Sequence[dict],
    half_modes: Sequence[int],
    *,
    fft_norm: str = "backward",
    separable: bool = False,
    implementation: str = "reconstructed",
    bias: Optional[jnp.ndarray] = None,
    output_sizes: Optional[Sequence[int]] = None,
) -> jnp.ndarray:
    """N-D spectral convolution.

    x: (B, d1, ..., dN, C_in) real.
    weights: list of 2^(N-1) factorized weight pytrees (corner order as in
        `corner_slices`).
    half_modes: modes kept per corner per axis (static ints).
    output_sizes: spatial sizes of the output (for up/down-scaling layers);
        defaults to input sizes.
    Returns (B, e1, ..., eN, C_out) real.
    """
    order = len(half_modes)
    spatial = x.shape[1:1 + order]
    for k, (m, size) in enumerate(zip(half_modes, spatial)):
        limit = size // 2 + 1 if k == order - 1 else size // 2
        if m > limit:
            raise ValueError(
                f"half_modes[{k}]={m} exceeds the available spectrum for "
                f"spatial size {size} (max {limit}); lower n_modes or raise "
                "the resolution")
    fft_axes = tuple(range(1, 1 + order))
    in_dtype = x.dtype
    if in_dtype not in (jnp.float32, jnp.float64):
        # bf16 activations: FFT requires f32/f64 (the reference likewise
        # upcasts, spectral_convolution.py:324); the result is cast back so
        # a bf16 pipeline stays bf16 between layers.
        x = x.astype(jnp.float32)
    x_ft = rfftn(x, axes=fft_axes, norm=fft_norm)

    spectrum_shape = list(x_ft.shape[1:1 + order])
    corners = corner_slices(half_modes)
    out_ft = None
    for w, corner in zip(weights, corners):
        idx = (slice(None),) + corner + (slice(None),)
        block = factorized.contract(
            x_ft[idx], w, separable=separable, implementation=implementation)
        cfg = [(0, 0, 0)] + _pad_config(corner, spectrum_shape) + [(0, 0, 0)]
        padded = jax.lax.pad(block, jnp.zeros((), block.dtype), cfg)
        out_ft = padded if out_ft is None else out_ft + padded

    out_sizes = tuple(output_sizes) if output_sizes is not None else spatial
    out = irfftn(out_ft, s=out_sizes, axes=fft_axes, norm=fft_norm)
    if bias is not None:
        out = out + bias
    if out.dtype != in_dtype and in_dtype not in (jnp.float32, jnp.float64):
        out = out.astype(in_dtype)
    return out


def spectral_conv_1d(x, weight, modes, **kw):
    """1-D special case: keep only low modes (spectral_convolution.py:382)."""
    return spectral_conv_nd(x, [weight], [modes], **kw)


def dft_matmul_reference(x: jnp.ndarray, weights: Sequence[jnp.ndarray],
                         half_modes: Sequence[int], fft_norm: str = "backward"):
    """Slow, obviously-correct oracle used by the tests: materializes the
    dense weights and does the corner writes with `.at[].set` (mirroring the
    reference's indexing semantics) instead of pad+sum."""
    order = len(half_modes)
    fft_axes = tuple(range(1, 1 + order))
    x_ft = rfftn(x, axes=fft_axes, norm=fft_norm)
    out_shape = list(x_ft.shape)
    out_shape[-1] = weights[0].shape[1]
    out_ft = jnp.zeros(out_shape, x_ft.dtype)
    for w, corner in zip(weights, corner_slices(half_modes)):
        idx = (slice(None),) + corner + (slice(None),)
        out_ft = out_ft.at[idx].set(
            factorized.contract_dense(x_ft[idx], w))
    return irfftn(out_ft, s=x.shape[1:1 + order], axes=fft_axes,
                  norm=fft_norm)
