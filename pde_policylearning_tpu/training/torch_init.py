"""Reference (torch) default-init redraw for training A/Bs.

The weight-transplant tests (tests/test_reference_parity.py) prove forward
parity, but *training* A/Bs also need the same starting distribution.
torch initializes nn.Linear / nn.ConvNd with
``kaiming_uniform_(a=sqrt(5))`` = U(+-sqrt(1/fan_in)) kernels and
U(+-1/sqrt(fan_in)) biases (torch/nn/modules/linear.py reset_parameters),
while flax Dense defaults to lecun-normal kernels (~2.3x the std) and zero
biases.  At small-sample budgets where best-test occurs within the first
few epochs, the init distribution measurably shifts the result.

`torch_reinit` walks a flax param tree and re-draws every Dense/1x1-conv
``kernel`` (ndim==2) and its sibling ``bias`` from the torch formula.
Spectral weights (real-stacked ``(2, ...)`` leaves) are left untouched:
their init already matches the reference's scaled complex ``normal_``
(models/spectral_layers.py; fno_models.py:SpectralConv2d).  The per-layer
spectral-conv ``bias`` is re-drawn from the reference's
``init_std * randn`` with init_std = 1/(in*out)
(spectral_convolution.py:272) — near-zero, but faithfully so.
"""
from __future__ import annotations

import zlib

import jax
import jax.numpy as jnp


def _u(key, shape, bound, dtype):
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_reinit(params, rng, exclude=()):
    """Return a copy of `params` with Dense kernels/biases re-drawn from
    the torch default init (see module docstring).  Deterministic in
    (params structure, rng).

    `exclude`: leaf-path substrings to leave untouched — for params whose
    reference init is NOT the torch default and whose flax init already
    matches it (e.g. RNO2d's input-projection kernel, drawn normal(std=1)
    on both sides, rno.py:311-312; its bias keeps the torch default and is
    still re-drawn)."""

    def visit(tree, path):
        out = {}
        kernel = tree.get("kernel")
        dense = (kernel is not None and hasattr(kernel, "ndim")
                 and kernel.ndim == 2)
        for name, v in tree.items():
            sub = f"{path}/{name}"
            key = jax.random.fold_in(rng, zlib.crc32(sub.encode()))
            if isinstance(v, dict):
                out[name] = visit(v, sub)
            elif any(e in sub for e in exclude):
                out[name] = v
            elif dense and name == "kernel":
                fan_in = v.shape[0]
                out[name] = _u(key, v.shape, float(fan_in) ** -0.5, v.dtype)
            elif dense and name == "bias":
                fan_in = kernel.shape[0]
                out[name] = _u(key, v.shape, float(fan_in) ** -0.5, v.dtype)
            elif name == "bias" and hasattr(v, "ndim"):
                # per-layer spectral-conv bias: the reference draws it
                # init_std * randn with init_std = 1/(in*out)
                # (spectral_convolution.py:223-224,272) — ~1e-3 std, i.e.
                # near-zero.  in==out==width for the trunk layers where
                # this bias exists.
                width = v.shape[-1]
                out[name] = (jax.random.normal(key, v.shape, v.dtype)
                             / float(width) ** 2)
            else:
                out[name] = v
        return out

    return visit(params, "")
