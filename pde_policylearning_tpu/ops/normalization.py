"""Data normalizers as pytree-friendly dataclasses.

reference: neuralop/utils.py:6 (UnitGaussianNormalizer over a dataset),
libs/utilities3.py:74 (NormalizerGivenMeanStd), :150-292 (UnitGaussian /
Gaussian / Range normalizers).

All are immutable pytrees (flax.struct) so they can be closed over by jitted
functions, donated, sharded, and checkpointed like any other state.  The
reference's `.cuda()/.cpu()` device juggling disappears — device placement is
XLA's job.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class UnitGaussianNormalizer:
    """Per-location mean/std computed over the sample axis (neuralop/utils.py:6)."""
    mean: jnp.ndarray
    std: jnp.ndarray
    eps: float = struct.field(pytree_node=False, default=1e-5)

    @classmethod
    def fit(cls, x, dim=None, eps=1e-5):
        # dim=None: statistics over the first axis (per-location), matching
        # the reference default of reducing over samples.
        if dim is None:
            dim = 0
        mean = jnp.mean(x, axis=dim)
        std = jnp.std(x, axis=dim)
        return cls(mean=mean, std=std, eps=eps)

    def encode(self, x):
        return (x - self.mean) / (self.std + self.eps)

    def decode(self, x):
        return x * (self.std + self.eps) + self.mean


@struct.dataclass
class NormalizerGivenMeanStd:
    """Fixed mean/std from dataset metadata (libs/utilities3.py:74)."""
    mean: jnp.ndarray
    std: jnp.ndarray
    eps: float = struct.field(pytree_node=False, default=1e-8)

    def encode(self, x):
        return (x - self.mean) / (self.std + self.eps)

    def decode(self, x):
        return x * (self.std + self.eps) + self.mean


@struct.dataclass
class GaussianNormalizer:
    """Scalar mean/std over the whole dataset (libs/utilities3.py:221)."""
    mean: jnp.ndarray
    std: jnp.ndarray
    eps: float = struct.field(pytree_node=False, default=1e-5)

    @classmethod
    def fit(cls, x, eps=1e-5):
        return cls(mean=jnp.mean(x), std=jnp.std(x), eps=eps)

    def encode(self, x):
        return (x - self.mean) / (self.std + self.eps)

    def decode(self, x):
        return x * (self.std + self.eps) + self.mean


@struct.dataclass
class RangeNormalizer:
    """Affine map to [low, high] (libs/utilities3.py:252)."""
    a: jnp.ndarray
    b: jnp.ndarray

    @classmethod
    def fit(cls, x, low=0.0, high=1.0):
        flat = x.reshape(x.shape[0], -1)
        mymin = jnp.min(flat, axis=0)
        mymax = jnp.max(flat, axis=0)
        a = (high - low) / (mymax - mymin)
        b = -a * mymax + high
        return cls(a=a, b=b)

    def encode(self, x):
        shape = x.shape
        flat = x.reshape(shape[0], -1)
        return (self.a * flat + self.b).reshape(shape)

    def decode(self, x):
        shape = x.shape
        flat = x.reshape(shape[0], -1)
        return ((flat - self.b) / self.a).reshape(shape)


class IdentityNormalizer:
    def encode(self, x):
        return x

    def decode(self, x):
        return x
