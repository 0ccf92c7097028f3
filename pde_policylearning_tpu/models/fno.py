"""FNO family: N-D Fourier Neural Operator, Tucker-factorized TFNO variants.

reference: neuralop/models/tfno.py:42 (FNO), :222/342/467 (FNO1d/2d/3d),
:594-624 (TFNO partials); neuralop/models/fno_block.py:123-170 (FNOBlocks).

Layout: channels-last (B, d1..dN, C).  The Python layer loop unrolls under
jit into one fused graph; weights stay per-layer (or one joint tensor).

Note on the reference's post-activation condition (fno_block.py:152):
`if not self.preactivation and (self.mlp is not None) or (index < (self.n_layers - index))`
— operator precedence plus `n_layers - index` make this fire on unintended
layers; here the intended rule is implemented: in post-activation mode, apply
the non-linearity after the conv+skip whenever an MLP follows or this is not
the last layer.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional, Sequence, Union

import flax.linen as nn
import jax.numpy as jnp

from ..ops import padding as padding_ops
from ..ops import resample as resample_ops
from . import layers
from .spectral_layers import SpectralConv, _norm_tuple


class FNOBlocks(nn.Module):
    """`n_layers` Fourier layers sharing one SpectralConv module.

    Each layer: [norm] -> spectral conv + skip -> act [-> MLP + skip -> act],
    with optional resnet-style preactivation ordering (fno_block.py:123-170).
    """
    in_channels: int
    out_channels: int
    n_modes: Union[int, Sequence[int]]
    n_layers: int = 1
    output_scaling_factor: Optional[Any] = None
    use_mlp: bool = False
    mlp_dropout: float = 0.0
    mlp_expansion: float = 0.5
    non_linearity: Callable = nn.gelu
    norm: Optional[str] = None
    ada_in_features: Optional[int] = None
    preactivation: bool = False
    fno_skip: str = "linear"
    mlp_skip: str = "soft-gating"
    separable: bool = False
    factorization: Optional[str] = None
    rank: float = 1.0
    joint_factorization: bool = False
    implementation: str = "factorized"
    fft_norm: str = "forward"
    incremental_n_modes: Optional[Sequence[int]] = None
    conv_backend: str = "auto"   # 'auto'|'xla'|'pallas' (spectral_layers)
    # Reproduce the reference's post-activation condition verbatim
    # (fno_block.py:152, including its precedence quirk) — needed for
    # bit-exact forward parity when transplanting reference checkpoints
    # (tests/test_reference_parity.py).  Default keeps the intended rule
    # (see module docstring).
    reference_act_quirk: bool = False

    def setup(self):
        modes = _norm_tuple(self.n_modes)
        self.n_dim = len(modes)
        osf = self.output_scaling_factor
        if osf is not None:
            if isinstance(osf, (float, int)):
                osf = [[float(osf)] * self.n_dim] * self.n_layers
            elif isinstance(osf[0], (float, int)):
                osf = [[float(s)] * self.n_dim for s in osf]
        self._osf = osf

        self.convs = SpectralConv(
            self.in_channels, self.out_channels, modes,
            n_layers=self.n_layers,
            separable=self.separable,
            factorization=self.factorization,
            rank=self.rank,
            implementation=self.implementation,
            joint_factorization=self.joint_factorization,
            fft_norm=self.fft_norm,
            output_scaling_factor=osf,
            incremental_n_modes=self.incremental_n_modes,
            backend=self.conv_backend,
        )
        self.fno_skips = [
            layers.SkipConnection(self.out_channels, self.fno_skip,
                                  name=f"fno_skip{i}")
            for i in range(self.n_layers)]
        if self.use_mlp:
            self.mlps = [
                layers.ChannelMLP(
                    out_channels=self.out_channels,
                    hidden_channels=int(round(self.out_channels
                                              * self.mlp_expansion)),
                    dropout=self.mlp_dropout,
                    non_linearity=self.non_linearity,
                    name=f"mlp{i}")
                for i in range(self.n_layers)]
            self.mlp_skips = [
                layers.SkipConnection(self.out_channels, self.mlp_skip,
                                      name=f"mlp_skip{i}")
                for i in range(self.n_layers)]
        n_norms = 2 if self.use_mlp else 1
        if self.norm is None:
            self.norms = None
        elif self.norm == "instance_norm":
            self.norms = "instance"
        elif self.norm == "group_norm":
            self.norms = [
                layers.GroupNorm(self.out_channels, name=f"norm{i}")
                for i in range(self.n_layers * n_norms)]
        elif self.norm == "ada_in":
            self.norms = [
                layers.AdaIN(self.out_channels, name=f"norm{i}")
                for i in range(self.n_layers * n_norms)]
        else:
            raise ValueError(
                f"Got norm={self.norm} but expected None or one of "
                "[instance_norm, group_norm, ada_in]")

    def _apply_norm(self, x, norm_index, ada_embedding):
        if self.norms is None:
            return x
        if self.norms == "instance":
            return layers.instance_norm(x)
        if self.norm == "ada_in":
            return self.norms[norm_index](x, ada_embedding)
        return self.norms[norm_index](x)

    def __call__(self, x, index: int = 0, ada_embedding=None,
                 deterministic: bool = True):
        n_norms = 2 if self.use_mlp else 1
        if self.preactivation:
            x = self.non_linearity(x)
            x = self._apply_norm(x, n_norms * index, ada_embedding)

        x_skip_fno = self.fno_skips[index](x)
        if self._osf is not None:
            x_skip_fno = resample_ops.resample(
                x_skip_fno, self._osf[index],
                list(range(1, 1 + self.n_dim)))
        if self.use_mlp:
            x_skip_mlp = self.mlp_skips[index](x)
            if self._osf is not None:
                x_skip_mlp = resample_ops.resample(
                    x_skip_mlp, self._osf[index],
                    list(range(1, 1 + self.n_dim)))

        x_fno = self.convs(x, index)
        if not self.preactivation:
            x_fno = self._apply_norm(x_fno, n_norms * index, ada_embedding)
        x = x_fno + x_skip_fno

        last_layer = index == self.n_layers - 1
        if self.reference_act_quirk:
            # fno_block.py:152 verbatim: `not prea and mlp` binds before
            # `or`, and the second disjunct is index < n_layers - index
            if (not self.preactivation and self.use_mlp) or \
                    (index < self.n_layers - index):
                x = self.non_linearity(x)
        elif not self.preactivation and (self.use_mlp or not last_layer):
            x = self.non_linearity(x)

        if self.use_mlp:
            if self.preactivation:
                if not last_layer:
                    x = self.non_linearity(x)
                x = self._apply_norm(x, n_norms * index + 1, ada_embedding)
            x = self.mlps[index](x, deterministic=deterministic) + x_skip_mlp
            if not self.preactivation:
                x = self._apply_norm(x, n_norms * index + 1, ada_embedding)
                if not last_layer:
                    x = self.non_linearity(x)
        return x


class FNO(nn.Module):
    """N-Dimensional Fourier Neural Operator (tfno.py:42).

    lift -> [domain pad] -> n_layers x FNOBlock -> [unpad] -> project.
    Dimensionality inferred from len(n_modes).
    """
    n_modes: Sequence[int]
    hidden_channels: int
    in_channels: int = 3
    out_channels: int = 1
    lifting_channels: int = 256
    projection_channels: int = 256
    n_layers: int = 4
    output_scaling_factor: Optional[Any] = None
    incremental_n_modes: Optional[Sequence[int]] = None
    use_mlp: bool = False
    mlp_dropout: float = 0.0
    mlp_expansion: float = 0.5
    non_linearity: Callable = nn.gelu
    norm: Optional[str] = None
    preactivation: bool = False
    fno_skip: str = "linear"
    mlp_skip: str = "soft-gating"
    separable: bool = False
    factorization: Optional[str] = None
    rank: float = 1.0
    joint_factorization: bool = False
    implementation: str = "factorized"
    domain_padding: Optional[float] = None
    domain_padding_mode: str = "one-sided"
    fft_norm: str = "forward"
    conv_backend: str = "auto"
    reference_act_quirk: bool = False  # see FNOBlocks

    def setup(self):
        self.n_dim = len(_norm_tuple(self.n_modes))
        osf = self.output_scaling_factor
        if osf is not None and not self.joint_factorization:
            if isinstance(osf, (float, int)):
                osf = [osf] * self.n_layers
        self.lifting = layers.Lifting(self.hidden_channels, name="lifting")
        self.fno_blocks = FNOBlocks(
            in_channels=self.hidden_channels,
            out_channels=self.hidden_channels,
            n_modes=self.n_modes,
            n_layers=self.n_layers,
            output_scaling_factor=osf,
            use_mlp=self.use_mlp,
            mlp_dropout=self.mlp_dropout,
            mlp_expansion=self.mlp_expansion,
            non_linearity=self.non_linearity,
            norm=self.norm,
            preactivation=self.preactivation,
            fno_skip=self.fno_skip,
            mlp_skip=self.mlp_skip,
            separable=self.separable,
            factorization=self.factorization,
            rank=self.rank,
            joint_factorization=self.joint_factorization,
            implementation=self.implementation,
            fft_norm=self.fft_norm,
            incremental_n_modes=self.incremental_n_modes,
            conv_backend=self.conv_backend,
            reference_act_quirk=self.reference_act_quirk,
            name="fno_blocks",
        )
        self.projection = layers.Projection(
            self.out_channels, self.projection_channels,
            non_linearity=self.non_linearity, name="projection")

    def __call__(self, x, deterministic: bool = True, ada_embedding=None):
        """x: (B, d1..dN, in_channels) -> (B, e1..eN, out_channels)."""
        x = self.lifting(x)
        if self.domain_padding is not None and self.domain_padding > 0:
            x = padding_ops.pad_domain(x, self.domain_padding,
                                       self.domain_padding_mode)
        for i in range(self.n_layers):
            x = self.fno_blocks(x, i, ada_embedding=ada_embedding,
                                deterministic=deterministic)
        if self.domain_padding is not None and self.domain_padding > 0:
            x = padding_ops.unpad_domain(
                x, self.domain_padding, self.domain_padding_mode,
                self.output_scaling_factor)
        return self.projection(x)


def FNO1d(n_modes_height, hidden_channels, **kwargs):
    """1D FNO (tfno.py:222)."""
    return FNO(n_modes=(n_modes_height,), hidden_channels=hidden_channels,
               **kwargs)


def FNO2d(n_modes_height, n_modes_width, hidden_channels, **kwargs):
    """2D FNO (tfno.py:342)."""
    return FNO(n_modes=(n_modes_height, n_modes_width),
               hidden_channels=hidden_channels, **kwargs)


def FNO3d(n_modes_height, n_modes_width, n_modes_depth, hidden_channels,
          **kwargs):
    """3D FNO (tfno.py:467)."""
    return FNO(n_modes=(n_modes_height, n_modes_width, n_modes_depth),
               hidden_channels=hidden_channels, **kwargs)


# Tucker-factorized variants (tfno.py:594-624 partialclass equivalents)
TFNO = partial(FNO, factorization="tucker")
def TFNO1d(n_modes_height, hidden_channels, **kw):
    kw.setdefault("factorization", "tucker")
    return FNO1d(n_modes_height, hidden_channels, **kw)
def TFNO2d(n_modes_height, n_modes_width, hidden_channels, **kw):
    kw.setdefault("factorization", "tucker")
    return FNO2d(n_modes_height, n_modes_width, hidden_channels, **kw)
def TFNO3d(n_modes_height, n_modes_width, n_modes_depth, hidden_channels, **kw):
    kw.setdefault("factorization", "tucker")
    return FNO3d(n_modes_height, n_modes_width, n_modes_depth,
                 hidden_channels, **kw)
