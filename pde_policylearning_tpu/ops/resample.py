"""Fourier / interpolation resampling of fields.

reference: neuralop/models/resample.py:7 (resample), :58 (iterative_resample).
Semantics preserved: 1 axis -> linear interpolation (align_corners), 2 axes ->
bicubic, >=3 axes -> spectral truncation/zero-padding with 'forward' norm.

Layout: channels-last (B, d1..dN, C); `axes` indexes into the array.
"""
from __future__ import annotations

import itertools
from typing import Sequence

import jax
import jax.numpy as jnp

from .fourier import irfftn as _irfftn_norm
from .fourier import rfftn as _rfftn_norm


def _interp_axes_resize(x, new_size, axes, method):
    shape = list(x.shape)
    for a, s in zip(axes, new_size):
        shape[a] = s
    # jax.image.resize with 'linear'/'cubic' matches align_corners=False
    # torch semantics approximately; for operator nets this is a smooth
    # down/up-scaling — exact boundary handling is not load-bearing.
    return jax.image.resize(x, tuple(shape), method=method)


def resample(x: jnp.ndarray, res_scale, axes: Sequence[int] | int | None = None
             ) -> jnp.ndarray:
    """Resample `x` along `axes` by factor(s) `res_scale`."""
    if isinstance(res_scale, (float, int)):
        if axes is None:
            axes = list(range(1, x.ndim - 1))  # all spatial (channels-last)
            res_scale = [res_scale] * len(axes)
        elif isinstance(axes, int):
            axes = [axes]
            res_scale = [res_scale]
        else:
            res_scale = [res_scale] * len(axes)
    else:
        axes = list(axes)
        assert len(res_scale) == len(axes)

    old_size = [x.shape[a] for a in axes]
    new_size = [int(round(s * r)) for s, r in zip(old_size, res_scale)]

    if len(axes) == 1:
        return _interp_axes_resize(x, new_size, axes, "linear")
    if len(axes) == 2:
        return _interp_axes_resize(x, new_size, axes, "cubic")

    return _spectral_resample(x, tuple(axes), tuple(new_size))


from functools import partial  # noqa: E402


@partial(jax.jit, static_argnames=("axes", "new_size"))
def _spectral_resample(x, axes, new_size):
    """Spectral resampling (resample.py:31-52): copy the retained corner
    spectrum into a new-size spectrum, zero elsewhere.  Jitted because the
    TPU runtime rejects eager complex-constant materialization."""
    X = _rfftn_norm(x, axes=axes, norm="forward")
    new_fft_size = list(new_size)
    new_fft_size[-1] = new_fft_size[-1] // 2 + 1
    old_fft_size = [X.shape[a] for a in axes]
    kept = [min(i, j) for i, j in zip(new_fft_size, old_fft_size)]

    mode_indexing = [((None, m // 2), (-(m // 2), None)) for m in kept[:-1]] \
        + [((None, kept[-1]),)]
    out_shape = list(X.shape)
    for a, s in zip(axes, new_fft_size):
        out_shape[a] = s
    out = jnp.zeros(out_shape, X.dtype)
    for boundaries in itertools.product(*mode_indexing):
        src = [slice(None)] * x.ndim
        dst = [slice(None)] * x.ndim
        for a, b in zip(axes, boundaries):
            src[a] = slice(*b)
            dst[a] = slice(*b)
        out = out.at[tuple(dst)].set(X[tuple(src)])
    return _irfftn_norm(out, s=new_size, axes=axes, norm="forward")


def iterative_resample(x, res_scale, axes):
    if isinstance(axes, list) and isinstance(res_scale, (float, int)):
        res_scale = [res_scale] * len(axes)
    if isinstance(axes, list):
        for rs, a in zip(res_scale, axes):
            x = _spectral_1d(x, rs, a)
        return x
    return _spectral_1d(x, res_scale, axes)


def _spectral_1d(x, res_scale, axis):
    old_res = x.shape[axis]
    new_res = int(round(res_scale * old_res))
    return _spectral_1d_jit(x, new_res, axis % x.ndim)


@partial(jax.jit, static_argnames=("new_res", "axis"))
def _spectral_1d_jit(x, new_res, axis):
    """1-axis spectral resample (resample.py:74-90)."""
    old_res = x.shape[axis]
    X = jnp.fft.rfft(x, axis=axis) * (1.0 / old_res)  # 'forward' norm, static
    modes = min(new_res, old_res)
    keep = modes // 2 + 1
    out_shape = list(x.shape)
    out_shape[axis] = new_res // 2 + 1
    out = jnp.zeros(out_shape, X.dtype)
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(0, keep)
    out = out.at[tuple(sl)].set(X[tuple(sl)])
    return jnp.fft.irfft(out, n=new_res, axis=axis) * float(new_res)
