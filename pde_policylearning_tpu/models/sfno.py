"""Spherical FNO: spectral convolution via spherical harmonic transforms.

reference: neuralop/models/spherical_convolution.py:165
(FactorizedSphericalConv — SHT instead of FFT, 'dhconv' contraction that is
diagonal in m with weights per degree l, SHT objects cached per resolution).
Here the SHT matrices come from ops/sht.py (cached per resolution) and the
contraction is an einsum.
"""
from __future__ import annotations

from typing import Optional, Sequence, Union

import flax.linen as nn
import jax.numpy as jnp

from ..ops import factorized
from ..ops.sht import irsht, rsht
from . import layers


class SphericalConv(nn.Module):
    """SHT -> truncated per-degree contraction -> inverse SHT.

    n_modes = (lmax, mmax).  `dhconv` weights have shape (in, out, lmax)
    (diagonal in m, spherical_convolution.py 'dhconv'); `full` weights have
    shape (in, out, lmax, mmax)."""
    in_channels: int
    out_channels: int
    n_modes: Sequence[int]
    n_layers: int = 1
    use_bias: bool = True
    factorization: Optional[str] = None
    rank: float = 0.5
    contraction: str = "dhconv"
    grid: str = "equiangular"
    init_std: Union[str, float] = "auto"

    def setup(self):
        lmax, mmax = self.n_modes[0], self.n_modes[1]
        if self.init_std == "auto":
            std = 1.0 / (self.in_channels * self.out_channels)
        else:
            std = float(self.init_std)
        if self.contraction == "dhconv":
            wshape = (self.in_channels, self.out_channels, lmax)
        else:
            wshape = (self.in_channels, self.out_channels, lmax, mmax)
        fact = self.factorization or "dense"
        self.weights = [
            self.param(f"w{i}",
                       lambda key: factorized.init_factorized(
                           key, wshape, fact, rank=self.rank, std=std))
            for i in range(self.n_layers)
        ]
        if self.use_bias:
            self.bias = self.param(
                "bias", lambda key: jnp.zeros((self.n_layers,
                                               self.out_channels)))

    def __call__(self, x, index: int = 0):
        """x: (B, nlat, nlon, C_in) -> same spatial size, C_out."""
        lmax, mmax = self.n_modes[0], self.n_modes[1]
        nlat, nlon = x.shape[-3], x.shape[-2]
        lmax = min(lmax, nlat)
        mmax = min(mmax, nlon // 2 + 1, lmax)
        in_dtype = x.dtype
        if in_dtype not in (jnp.float32, jnp.float64):
            x = x.astype(jnp.float32)
        flm = rsht(x, lmax=lmax, mmax=mmax, grid=self.grid)
        w = factorized.to_dense(self.weights[index])
        if self.contraction == "dhconv":
            w = w[..., :lmax]
            out = jnp.einsum("blmi,iol->blmo", flm, w)
        else:
            w = w[..., :lmax, :mmax]
            out = jnp.einsum("blmi,iolm->blmo", flm, w)
        y = irsht(out, nlat, nlon, grid=self.grid)
        if self.use_bias:
            y = y + self.bias[index]
        if y.dtype != in_dtype and in_dtype not in (jnp.float32,
                                                    jnp.float64):
            y = y.astype(in_dtype)
        return y


class SFNO(nn.Module):
    """Spherical FNO: lift -> n x (spherical conv + skip + act) -> project
    (the reference's FNO with SpectralConv=FactorizedSphericalConv,
    tfno.py SFNO usage)."""
    n_modes: Sequence[int]
    hidden_channels: int
    in_channels: int = 3
    out_channels: int = 1
    lifting_channels: int = 256
    projection_channels: int = 256
    n_layers: int = 4
    factorization: Optional[str] = None
    rank: float = 0.5
    contraction: str = "dhconv"
    grid: str = "equiangular"
    fno_skip: str = "linear"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = layers.Lifting(self.hidden_channels, name="lifting")(x)
        conv = SphericalConv(
            self.hidden_channels, self.hidden_channels, tuple(self.n_modes),
            n_layers=self.n_layers, factorization=self.factorization,
            rank=self.rank, contraction=self.contraction, grid=self.grid,
            name="convs")
        for i in range(self.n_layers):
            skip = layers.SkipConnection(self.hidden_channels,
                                         self.fno_skip,
                                         name=f"skip{i}")(x)
            x = conv(x, i) + skip
            if i < self.n_layers - 1:
                x = nn.gelu(x)
        return layers.Projection(self.out_channels,
                                 self.projection_channels,
                                 name="projection")(x)
