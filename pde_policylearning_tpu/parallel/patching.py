"""Multigrid domain-decomposition patching over the device mesh.

reference: neuralop/training/patching.py:8 (MultigridPatching2D),
:161 (make_patches).

The reference splits 2-D fields into 2^levels x 2^levels overlapping
circular-padded patches stacked in the batch dim, adds coarsened context
channels per level, then scatters the patch-batch across the NCCL
model-parallel group with Megatron-style autograd collectives
(mpu/mappings.py:33-96).

TPU re-design: patch extraction is static window slicing (XLA fuses the
gathers); distribution is a sharding annotation — the patch-batch axis is
sharded over the 'model' mesh axis with `with_sharding_constraint`, and XLA
SPMD inserts the scatter/gather collectives *and their gradients*.  The
explicit grad-rescale hook (patching.py:36-38) disappears: pjit's psum
already produces the correct sum over an un-averaged axis.

Layout: channels-last (B, H, W, C).
"""
from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS


def _wrap_pad_2d(x, ph, pw):
    if ph == 0 and pw == 0:
        return x
    return jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)), mode="wrap")


def _windows_2d(x, win_h, win_w, stride_h, stride_w, n_h, n_w):
    """Extract an n_h x n_w grid of (win_h, win_w) windows; returns
    (B * n_h * n_w, win_h, win_w, C) with patch-major-over-batch layout
    matching the reference's unfold+reshape (patching.py:198-201)."""
    rows = []
    for i in range(n_h):
        cols = []
        for j in range(n_w):
            h0 = i * stride_h
            w0 = j * stride_w
            cols.append(x[:, h0:h0 + win_h, w0:w0 + win_w, :])
        rows.append(jnp.stack(cols, axis=1))
    patches = jnp.stack(rows, axis=1)  # (B, n_h, n_w, win_h, win_w, C)
    B = x.shape[0]
    C = x.shape[-1]
    return patches.reshape(B * n_h * n_w, win_h, win_w, C)


def make_patches(x: jnp.ndarray, n, p=0) -> jnp.ndarray:
    """(B, H, W, C) -> (B*n1*n2, H/n1 + 2p1, W/n2 + 2p2, C) with circular
    padding (patching.py:161-202)."""
    if isinstance(n, int):
        n = [n, n]
    if isinstance(p, int):
        p = [p, p]
    B, H, W, C = x.shape
    if n[0] <= 1 and n[1] <= 1:
        return _wrap_pad_2d(x, p[0], p[1])
    assert H % n[0] == 0 and W % n[1] == 0, "Patches must be equally sized"
    ph, pw = H // n[0], W // n[1]
    xp = _wrap_pad_2d(x, p[0], p[1])
    return _windows_2d(xp, ph + 2 * p[0], pw + 2 * p[1], ph, pw, n[0], n[1])


def stitch_patches(x: jnp.ndarray, n) -> jnp.ndarray:
    """Inverse of make_patches with p=0 (patching.py:77-103)."""
    if isinstance(n, int):
        n = [n, n]
    if n[0] <= 1 and n[1] <= 1:
        return x
    Bn, ph, pw, C = x.shape
    B = Bn // (n[0] * n[1])
    x = x.reshape(B, n[0], n[1], ph, pw, C)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(B, n[0] * ph, n[1] * pw, C)


def make_mg_patches(x: jnp.ndarray, levels: int,
                    padding_fraction=0) -> jnp.ndarray:
    """Patches + per-level coarsened context channels
    (patching.py:105-153).  Output channels = C * (levels + 1)."""
    if levels <= 0:
        return x
    if isinstance(padding_fraction, (int, float)):
        padding_fraction = [padding_fraction, padding_fraction]
    B, H, W, C = x.shape
    pad = [int(round(H * padding_fraction[0])),
           int(round(W * padding_fraction[1]))]
    n = 2 ** levels
    patched = make_patches(x, n=n, p=pad)
    s1 = patched.shape[1] - 2 * pad[0]
    s2 = patched.shape[2] - 2 * pad[1]

    pieces = [patched]
    for level in range(1, levels + 1):
        sub = 2 ** level
        s1_stride = s1 // sub
        s2_stride = s2 // sub
        x_sub = x[:, ::sub, ::sub, :]
        # symmetric circular pad so that n windows of the patch size with
        # the coarse stride cover the subsampled field (patching.py:128-137)
        s1_pad = math.ceil((s1 + (n - 1) * s1_stride
                            - x_sub.shape[1]) / 2.0) + pad[0]
        s2_pad = math.ceil((s2 + (n - 1) * s2_stride
                            - x_sub.shape[2]) / 2.0) + pad[1]
        x_sub = _wrap_pad_2d(x_sub, s1_pad, s2_pad)
        ctx = _windows_2d(x_sub, s1 + 2 * pad[0], s2 + 2 * pad[1],
                          s1_stride, s2_stride, n, n)
        pieces.append(ctx)
    return jnp.concatenate(pieces, axis=-1)


class MultigridPatching2D:
    """patch/unpatch wrapper with optional mesh sharding of the patch-batch
    axis (the reference's model-parallel scatter/gather,
    patching.py:40-75)."""

    def __init__(self, levels: int = 0, padding_fraction=0,
                 mesh: Optional[Mesh] = None, stitching: bool = True):
        self.levels = levels
        self.skip_padding = (padding_fraction is None
                             or (isinstance(padding_fraction, (int, float))
                                 and padding_fraction <= 0))
        if isinstance(padding_fraction, (int, float)):
            padding_fraction = [padding_fraction, padding_fraction]
        self.padding_fraction = padding_fraction
        self.n_patches = 2 ** levels
        self.mesh = mesh
        self.stitching = stitching
        self._pad = None

    def _shard_patches(self, x):
        if self.mesh is None:
            return x
        spec = P((MODEL_AXIS,))
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.mesh, spec))

    def patch(self, x, y):
        if self.levels <= 0:
            return x, y
        B, H, W, C = x.shape
        self._pad = [int(round(H * self.padding_fraction[0])),
                     int(round(W * self.padding_fraction[1]))]
        if self.mesh is not None and not self.stitching:
            y = self._shard_patches(make_patches(y, self.n_patches, 0))
        x = make_mg_patches(x, self.levels, self.padding_fraction)
        x = self._shard_patches(x)
        return x, y

    def unpatch(self, out, y, evaluation: bool = False):
        if self.levels <= 0 or self.skip_padding:
            return out, y
        ph, pw = self._pad
        if ph > 0 or pw > 0:
            out = out[:, ph:-ph or None, pw:-pw or None, :]
        if self.stitching or evaluation:
            out = stitch_patches(out, self.n_patches)
        return out, y
