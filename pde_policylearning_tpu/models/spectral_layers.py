"""Flax modules around the spectral-convolution core op.

reference: neuralop/models/spectral_convolution.py:143 (FactorizedSpectralConv
and its 1d/2d/3d subclasses — here one rank-generic module).
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Union

import flax.linen as nn
import jax.numpy as jnp

from ..ops import factorized, fourier


def _norm_tuple(n_modes) -> tuple[int, ...]:
    if isinstance(n_modes, int):
        return (n_modes,)
    return tuple(int(m) for m in n_modes)


class SpectralConv(nn.Module):
    """N-D factorized spectral convolution holding `n_layers` layer weights.

    Calling convention: ``conv(x, index)`` picks layer `index`'s weights —
    mirroring the reference's indexed forward so FNOBlocks can share one
    module across layers (and one *tensor* under joint factorization).

    `n_modes` are total mode counts per dim; each corner keeps `m//2`
    (spectral_convolution.py:196-203).
    """
    in_channels: int
    out_channels: int
    n_modes: Union[int, Sequence[int]]
    n_layers: int = 1
    separable: bool = False
    factorization: Optional[str] = None
    rank: float = 0.5
    implementation: str = "reconstructed"
    joint_factorization: bool = False
    use_bias: bool = True
    # 'auto' routes eligible 2-D convs through the fused Pallas corner-
    # contraction kernel on TPU (4.5x at research shapes); set 'xla' when
    # sharding the conv itself under pjit (pallas_call sees global shapes).
    backend: str = "auto"
    fft_norm: str = "backward"
    init_std: Union[str, float] = "auto"
    output_scaling_factor: Optional[Sequence[Sequence[float]]] = None
    incremental_n_modes: Optional[Sequence[int]] = None
    # accepted for reference-signature parity; factor ranks are resolved by
    # ops.factorized (tltorch's fixed_rank_modes pins mode-0's rank — the
    # rank heuristics here already keep channel ranks >= mode ranks)
    fixed_rank_modes: Union[bool, Sequence[int]] = False
    decomposition_kwargs: Optional[dict] = None

    def setup(self):
        modes = _norm_tuple(self.n_modes)
        self.order = len(modes)
        self.half_total_n_modes = tuple(m // 2 for m in modes)
        self.n_corners = 2 ** (self.order - 1)
        if self.init_std == "auto":
            std = 1.0 / (self.in_channels * self.out_channels)
        else:
            std = float(self.init_std)
        fact = self.factorization or "dense"
        if self.separable:
            if self.in_channels != self.out_channels:
                raise ValueError(
                    "separable requires in_channels == out_channels, got "
                    f"{self.in_channels} != {self.out_channels}")
            wshape = (self.in_channels, *self.half_total_n_modes)
        else:
            wshape = (self.in_channels, self.out_channels,
                      *self.half_total_n_modes)

        n_total = self.n_corners * self.n_layers
        n_lead = len(wshape) - self.order  # 1 separable, 2 regular
        if self.joint_factorization:
            self.weight = self.param(
                "weight",
                lambda key: factorized.init_factorized(
                    key, (n_total, *wshape), fact, rank=self.rank, std=std,
                    n_lead=n_lead + 1))
        else:
            self.weights = [
                self.param(
                    f"w{i}",
                    lambda key: factorized.init_factorized(
                        key, wshape, fact, rank=self.rank, std=std,
                        n_lead=n_lead))
                for i in range(n_total)
            ]
        if self.use_bias:
            self.bias = self.param(
                "bias",
                lambda key: std * jnp.zeros((self.n_layers,
                                             self.out_channels)))

    def _layer_weights(self, index: int):
        base = self.n_corners * index
        if self.joint_factorization:
            return [factorized.take_layer(self.weight, base + i)
                    for i in range(self.n_corners)]
        return self.weights[base:base + self.n_corners]

    def __call__(self, x, index: int = 0,
                 half_modes: Optional[Sequence[int]] = None):
        """x: (B, d1..dN, C_in) -> (B, e1..eN, C_out).

        `half_modes` overrides the per-corner mode counts at call time (the
        incremental_n_modes mechanism); must be <= half_total_n_modes."""
        if half_modes is None:
            if self.incremental_n_modes is not None:
                inc = _norm_tuple(self.incremental_n_modes)
                half_modes = tuple(m // 2 for m in inc)
            else:
                half_modes = self.half_total_n_modes
        ws = self._layer_weights(index)
        if tuple(half_modes) != self.half_total_n_modes:
            ws = [fourier.slice_weight_modes(w, half_modes, self.separable)
                  for w in ws]
        output_sizes = None
        if self.output_scaling_factor is not None:
            factor = self.output_scaling_factor[index]
            if isinstance(factor, (int, float)):
                factor = [factor] * self.order
            output_sizes = [
                int(round(s * r))
                for s, r in zip(x.shape[1:1 + self.order], factor)]
        bias = self.bias[index] if self.use_bias else None
        return fourier.spectral_conv_nd(
            x, ws, half_modes,
            fft_norm=self.fft_norm,
            separable=self.separable,
            implementation=self.implementation,
            bias=bias,
            output_sizes=output_sizes,
            backend=self.backend,
        )
