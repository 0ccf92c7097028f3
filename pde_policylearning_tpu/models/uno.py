"""U-shaped Neural Operator.

reference: neuralop/models/uno.py:15 — per-layer channel lists, per-layer
resolution scalings, and horizontal skip connections resampled to the
current resolution.  The shipped UNO is Tucker-factorized by default
(uno.py:236).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops import padding as padding_ops
from ..ops import resample as resample_ops
from . import layers
from .fno import FNOBlocks


class UNO(nn.Module):
    in_channels: int
    out_channels: int
    hidden_channels: int
    uno_out_channels: Sequence[int]
    uno_n_modes: Sequence[Sequence[int]]
    uno_scalings: Sequence[Any]
    lifting_channels: int = 256
    projection_channels: int = 256
    n_layers: int = 4
    horizontal_skips_map: Optional[Dict[int, int]] = None
    use_mlp: bool = False
    mlp_dropout: float = 0.0
    mlp_expansion: float = 0.5
    non_linearity: Callable = nn.gelu
    norm: Optional[str] = None
    preactivation: bool = False
    fno_skip: str = "linear"
    horizontal_skip: str = "linear"
    mlp_skip: str = "soft-gating"
    separable: bool = False
    factorization: Optional[str] = "tucker"
    rank: float = 1.0
    implementation: str = "factorized"
    domain_padding: Optional[float] = None
    domain_padding_mode: str = "one-sided"
    fft_norm: str = "forward"

    def setup(self):
        assert len(self.uno_out_channels) == self.n_layers
        assert len(self.uno_n_modes) == self.n_layers
        assert len(self.uno_scalings) == self.n_layers
        self.n_dim = len(self.uno_n_modes[0])

        skips = self.horizontal_skips_map
        if skips is None:
            # default U-shape: layer n-1-i skips from layer i (uno.py:158)
            skips = {self.n_layers - i - 1: i
                     for i in range(self.n_layers // 2)}
        self._skips_map = skips

        self.lifting = layers.Lifting(self.hidden_channels, name="lifting")
        blocks = []
        prev_out = self.hidden_channels
        horiz = {}
        for i in range(self.n_layers):
            if i in skips:
                prev_out = prev_out + self.uno_out_channels[skips[i]]
            blocks.append(FNOBlocks(
                in_channels=prev_out,
                out_channels=self.uno_out_channels[i],
                n_modes=tuple(self.uno_n_modes[i]),
                n_layers=1,
                output_scaling_factor=self.uno_scalings[i],
                use_mlp=self.use_mlp, mlp_dropout=self.mlp_dropout,
                mlp_expansion=self.mlp_expansion,
                non_linearity=self.non_linearity,
                norm=self.norm, preactivation=self.preactivation,
                fno_skip=self.fno_skip, mlp_skip=self.mlp_skip,
                separable=self.separable,
                factorization=self.factorization, rank=self.rank,
                implementation=self.implementation,
                fft_norm=self.fft_norm,
                name=f"block{i}"))
            if i in skips.values():
                horiz[str(i)] = layers.SkipConnection(
                    self.uno_out_channels[i], self.horizontal_skip,
                    name=f"hskip{i}")
            prev_out = self.uno_out_channels[i]
        self.blocks = blocks
        self.horizontal_skips = horiz
        self.projection = layers.Projection(
            self.out_channels, self.projection_channels,
            non_linearity=self.non_linearity, name="projection")

    def __call__(self, x, deterministic: bool = True):
        """x: (B, d1..dN, in_channels)."""
        x = self.lifting(x)
        if self.domain_padding is not None and self.domain_padding > 0:
            x = padding_ops.pad_domain(x, self.domain_padding,
                                       self.domain_padding_mode)
        skip_outputs = {}
        for i in range(self.n_layers):
            if i in self._skips_map:
                skip_val = skip_outputs[self._skips_map[i]]
                factors = [xs / ss for xs, ss in
                           zip(x.shape[1:1 + self.n_dim],
                               skip_val.shape[1:1 + self.n_dim])]
                t = resample_ops.resample(skip_val, factors,
                                          list(range(1, 1 + self.n_dim)))
                x = jnp.concatenate([x, t], axis=-1)
            x = self.blocks[i](x, 0, deterministic=deterministic)
            if i in self._skips_map.values():
                skip_outputs[i] = self.horizontal_skips[str(i)](x)
        if self.domain_padding is not None and self.domain_padding > 0:
            x = padding_ops.unpad_domain(x, self.domain_padding,
                                         self.domain_padding_mode)
        return self.projection(x)
