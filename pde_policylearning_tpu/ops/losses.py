"""Loss functions: relative/absolute Lp, Sobolev H1/Hs, dissipative reg.

reference: neuralop/training/losses.py (LpLoss:62, H1Loss:138,
DissipativeLoss:280, central_diff_{1,2,3}d:8-58) and libs/utilities3.py
(LpLoss:295, HsLoss:341).

All losses are pure functions of arrays -> scalar (or per-sample vector),
jit/grad-safe, layout-agnostic (they flatten the trailing `d` dims).
"""
from __future__ import annotations

import math
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# central differences (periodic roll; optionally one-sided at boundaries)
# ---------------------------------------------------------------------------

def central_diff_1d(x, h, fix_x_bnd=False):
    dx = (jnp.roll(x, -1, axis=-1) - jnp.roll(x, 1, axis=-1)) / (2.0 * h)
    if fix_x_bnd:
        dx = dx.at[..., 0].set((x[..., 1] - x[..., 0]) / h)
        dx = dx.at[..., -1].set((x[..., -1] - x[..., -2]) / h)
    return dx


def central_diff_2d(x, h, fix_x_bnd=False, fix_y_bnd=False):
    if isinstance(h, float):
        h = [h, h]
    dx = (jnp.roll(x, -1, axis=-2) - jnp.roll(x, 1, axis=-2)) / (2.0 * h[0])
    dy = (jnp.roll(x, -1, axis=-1) - jnp.roll(x, 1, axis=-1)) / (2.0 * h[1])
    if fix_x_bnd:
        dx = dx.at[..., 0, :].set((x[..., 1, :] - x[..., 0, :]) / h[0])
        dx = dx.at[..., -1, :].set((x[..., -1, :] - x[..., -2, :]) / h[0])
    if fix_y_bnd:
        dy = dy.at[..., :, 0].set((x[..., :, 1] - x[..., :, 0]) / h[1])
        dy = dy.at[..., :, -1].set((x[..., :, -1] - x[..., :, -2]) / h[1])
    return dx, dy


def central_diff_3d(x, h, fix_x_bnd=False, fix_y_bnd=False, fix_z_bnd=False):
    if isinstance(h, float):
        h = [h, h, h]
    dx = (jnp.roll(x, -1, axis=-3) - jnp.roll(x, 1, axis=-3)) / (2.0 * h[0])
    dy = (jnp.roll(x, -1, axis=-2) - jnp.roll(x, 1, axis=-2)) / (2.0 * h[1])
    dz = (jnp.roll(x, -1, axis=-1) - jnp.roll(x, 1, axis=-1)) / (2.0 * h[2])
    if fix_x_bnd:
        dx = dx.at[..., 0, :, :].set((x[..., 1, :, :] - x[..., 0, :, :]) / h[0])
        dx = dx.at[..., -1, :, :].set((x[..., -1, :, :] - x[..., -2, :, :]) / h[0])
    if fix_y_bnd:
        dy = dy.at[..., :, 0, :].set((x[..., :, 1, :] - x[..., :, 0, :]) / h[1])
        dy = dy.at[..., :, -1, :].set((x[..., :, -1, :] - x[..., :, -2, :]) / h[1])
    if fix_z_bnd:
        dz = dz.at[..., :, :, 0].set((x[..., :, :, 1] - x[..., :, :, 0]) / h[2])
        dz = dz.at[..., :, :, -1].set((x[..., :, :, -1] - x[..., :, :, -2]) / h[2])
    return dx, dy, dz


# ---------------------------------------------------------------------------
# Lp losses
# ---------------------------------------------------------------------------

def _flat_norm(x, d, p):
    flat = x.reshape(*x.shape[:x.ndim - d], -1)
    if p == 2:
        return jnp.sqrt(jnp.sum(flat * flat, axis=-1))
    return jnp.sum(jnp.abs(flat) ** p, axis=-1) ** (1.0 / p)


class LpLoss:
    """Relative / absolute Lp loss over the last `d` dims.

    reference: neuralop/training/losses.py:62.  Calling the object computes
    the relative loss; the reduction over remaining (batch) dims follows
    `reductions` ('sum' or 'mean').
    """

    def __init__(self, d=1, p=2, L=2 * math.pi, reduce_dims=0, reductions="sum"):
        self.d = d
        self.p = p
        if isinstance(reduce_dims, int):
            reduce_dims = [reduce_dims]
        self.reduce_dims = reduce_dims
        if self.reduce_dims is not None:
            if isinstance(reductions, str):
                reductions = [reductions] * len(self.reduce_dims)
            self.reductions = reductions
        if isinstance(L, float):
            L = [L] * self.d
        self.L = L

    def uniform_h(self, x):
        return [self.L[-j] / x.shape[-j] for j in range(self.d, 0, -1)]

    def reduce_all(self, x):
        for dim, red in zip(self.reduce_dims, self.reductions):
            x = (jnp.sum if red == "sum" else jnp.mean)(x, axis=dim, keepdims=True)
        return x

    def abs(self, x, y, h=None):
        if h is None:
            h = self.uniform_h(x)
        elif isinstance(h, float):
            h = [h] * self.d
        const = math.prod(h) ** (1.0 / self.p)
        diff = const * _flat_norm(x - y, self.d, self.p)
        if self.reduce_dims is not None:
            diff = self.reduce_all(diff).squeeze()
        return diff

    def rel(self, x, y):
        diff = _flat_norm(x - y, self.d, self.p) / _flat_norm(y, self.d, self.p)
        if self.reduce_dims is not None:
            diff = self.reduce_all(diff).squeeze()
        return diff

    def __call__(self, x, y):
        return self.rel(x, y)


class SimpleLpLoss:
    """The libs/utilities3.py:295 LpLoss: flattens all but the batch dim;
    `size_average` picks mean vs sum over the batch."""

    def __init__(self, d=2, p=2, size_average=True, reduction=True):
        self.d, self.p = d, p
        self.size_average = size_average
        self.reduction = reduction

    def abs(self, x, y):
        num_examples = x.shape[0]
        h = 1.0 / (x.shape[1] - 1.0)
        flat = (x - y).reshape(num_examples, -1)
        all_norms = (h ** (self.d / self.p)) * jnp.linalg.norm(
            flat, self.p, axis=1)
        if self.reduction:
            return jnp.mean(all_norms) if self.size_average else jnp.sum(all_norms)
        return all_norms

    def rel(self, x, y):
        num = x.shape[0]
        diff = jnp.linalg.norm(x.reshape(num, -1) - y.reshape(num, -1),
                               self.p, axis=1)
        ynorm = jnp.linalg.norm(y.reshape(num, -1), self.p, axis=1)
        out = diff / ynorm
        if self.reduction:
            return jnp.mean(out) if self.size_average else jnp.sum(out)
        return out

    def __call__(self, x, y):
        return self.rel(x, y)


def relative_l2(pred, target, axis=None):
    """Plain relative L2, the libs/env_util.py:13 `relative_loss`."""
    return jnp.linalg.norm(pred - target) / jnp.linalg.norm(target)


class H1Loss:
    """Sobolev H1 loss via central differences over the last `d` dims.

    reference: neuralop/training/losses.py:138.
    """

    def __init__(self, d=1, L=2 * math.pi, reduce_dims=0, reductions="sum",
                 fix_x_bnd=False, fix_y_bnd=False, fix_z_bnd=False):
        assert 1 <= d <= 3
        self.d = d
        self.fix_bnd = [fix_x_bnd, fix_y_bnd, fix_z_bnd]
        if isinstance(reduce_dims, int):
            reduce_dims = [reduce_dims]
        self.reduce_dims = reduce_dims
        if self.reduce_dims is not None:
            if isinstance(reductions, str):
                reductions = [reductions] * len(self.reduce_dims)
            self.reductions = reductions
        if isinstance(L, float):
            L = [L] * self.d
        self.L = L

    def uniform_h(self, x):
        return [self.L[-j] / x.shape[-j] for j in range(self.d, 0, -1)]

    def reduce_all(self, x):
        for dim, red in zip(self.reduce_dims, self.reductions):
            x = (jnp.sum if red == "sum" else jnp.mean)(x, axis=dim, keepdims=True)
        return x

    def _derivs(self, x, h):
        if self.d == 1:
            return [central_diff_1d(x, h[0], fix_x_bnd=self.fix_bnd[0])]
        if self.d == 2:
            return list(central_diff_2d(x, h, self.fix_bnd[0], self.fix_bnd[1]))
        return list(central_diff_3d(x, h, *self.fix_bnd))

    def _sq(self, x):
        flat = x.reshape(*x.shape[:x.ndim - self.d], -1)
        return jnp.sum(flat * flat, axis=-1)

    def rel(self, x, y, h=None):
        if h is None:
            h = self.uniform_h(x)
        elif isinstance(h, float):
            h = [h] * self.d
        dxs = self._derivs(x, h)
        dys = self._derivs(y, h)
        diff = self._sq(x - y) + sum(self._sq(a - b) for a, b in zip(dxs, dys))
        ynorm = self._sq(y) + sum(self._sq(b) for b in dys)
        out = jnp.sqrt(diff) / jnp.sqrt(ynorm)
        if self.reduce_dims is not None:
            out = self.reduce_all(out).squeeze()
        return out

    def abs(self, x, y, h=None):
        if h is None:
            h = self.uniform_h(x)
        elif isinstance(h, float):
            h = [h] * self.d
        const = math.prod(h)
        dxs = self._derivs(x, h)
        dys = self._derivs(y, h)
        diff = const * (self._sq(x - y)
                        + sum(self._sq(a - b) for a, b in zip(dxs, dys)))
        out = jnp.sqrt(diff)
        if self.reduce_dims is not None:
            out = self.reduce_all(out).squeeze()
        return out

    def __call__(self, x, y, h=None):
        return self.rel(x, y, h=h)


class HsLoss:
    """Spectral Sobolev loss (libs/utilities3.py:341): weights the FFT
    difference by (1 + a1 k^2 + a2 k^4)^(s) style multipliers."""

    def __init__(self, d=2, p=2, k=1, a=None, group=False, size_average=True,
                 reduction=True):
        self.d, self.p, self.k = d, p, k
        self.balanced = group
        self.size_average = size_average
        self.reduction = reduction
        if a is None:
            a = [1.0] * k
        self.a = a

    def __call__(self, x, y):
        nx, ny = x.shape[1], x.shape[2]
        k = self.k
        # wavenumber grids (centered)
        k_x = jnp.fft.fftfreq(nx, d=1.0 / nx).reshape(nx, 1)
        k_y = jnp.fft.fftfreq(ny, d=1.0 / ny).reshape(1, ny)
        x_ft = jnp.fft.fftn(x, axes=(1, 2))
        y_ft = jnp.fft.fftn(y, axes=(1, 2))
        bshape = (1, nx, ny) + (1,) * (x.ndim - 3)
        kx = jnp.reshape(k_x * jnp.ones((nx, ny)), bshape)
        ky = jnp.reshape(k_y * jnp.ones((nx, ny)), bshape)
        weight = jnp.ones_like(kx)
        if k >= 1:
            weight = weight + self.a[0] ** 2 * (kx ** 2 + ky ** 2)
        if k >= 2:
            weight = weight + self.a[1] ** 2 * (kx ** 2 + ky ** 2) ** 2
        weight = jnp.sqrt(weight)
        num = x.shape[0]
        diff = jnp.linalg.norm(
            (weight * (x_ft - y_ft)).reshape(num, -1), self.p, axis=1)
        ynorm = jnp.linalg.norm((weight * y_ft).reshape(num, -1), self.p, axis=1)
        out = diff / ynorm
        if self.reduction:
            return jnp.mean(out) if self.size_average else jnp.sum(out)
        return out


def dissipative_loss(model_pred_norms, x_norms, scale_down, loss_weight=1.0):
    """Dissipativity regularization core (losses.py:280): encourages
    ||model(x)|| <= scale_down * ||x|| for inputs sampled on an outer shell.
    Callers sample the shell and pass the norms."""
    target = scale_down * x_norms
    return loss_weight * jnp.mean((model_pred_norms - target) ** 2)
