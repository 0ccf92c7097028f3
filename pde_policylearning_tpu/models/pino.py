"""PINO models: physics-informed neural operator observers and policies.

reference: libs/models/pino_models/pinobserver.py (PINObserver2d:129,
PlanePredHead:236, PINObserverFullField:276, PolicyModel2D:378),
basics.py (SpectralConv3d:99, FourierBlock:148), FCN.py (DenseNet:30),
lowrank2d.py (LowRank2d:8).

Layout: channels-last (B, X, Y, T, C); the trunk is SpectralConv3d +
pointwise-linear skip per layer.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops import factorized, fourier
from .mfn import MFNFourierLayer, MultiplicativeNet


def get_act(name: str) -> Callable:
    return {"tanh": nn.tanh, "gelu": nn.gelu, "relu": nn.relu,
            "leaky_relu": nn.leaky_relu, "none": lambda x: x}[name]


class SpectralConvND(nn.Module):
    """Plain dense N-D spectral conv (pino basics.py SpectralConv1d/2d/3d:
    corner-truncated complex contraction, backward norm)."""
    in_channels: int
    out_channels: int
    modes: Sequence[int]

    @nn.compact
    def __call__(self, x):
        order = len(self.modes)
        std = 1.0 / (self.in_channels * self.out_channels)
        shape = (self.in_channels, self.out_channels, *self.modes)
        n_corners = 2 ** (order - 1)
        ws = [self.param(f"w{i}",
                         lambda key: factorized.init_factorized(
                             key, shape, "dense", std=std))
              for i in range(n_corners)]
        return fourier.spectral_conv_nd(x, ws, tuple(self.modes))


class PINOTrunk(nn.Module):
    """`len(layers)-1` x (SpectralConv3d + pointwise skip) with activation
    between layers (pinobserver.py:178-183, 259-266).

    remat: checkpoint each layer so backward recomputes activations
    instead of storing them — at the reference pretrain resolution
    (128x128x65, width 64, b4) the stored activations alone exceed a
    16 GB chip; remat trades ~30% step time for O(1-layer) memory."""
    layers: Sequence[int]
    modes1: Sequence[int]
    modes2: Sequence[int]
    modes3: Sequence[int]
    act: str = "gelu"
    remat: bool = False

    @nn.compact
    def __call__(self, x):
        act = get_act(self.act)
        n = len(self.layers) - 1
        for i in range(n):
            layer_cls = SpectralConvND
            dense_cls = nn.Dense
            if self.remat:
                layer_cls = nn.remat(SpectralConvND)
                dense_cls = nn.remat(nn.Dense)
            x1 = layer_cls(self.layers[i], self.layers[i + 1],
                           (self.modes1[i], self.modes2[i],
                            self.modes3[i]), name=f"sp{i}")(x)
            x2 = dense_cls(self.layers[i + 1], name=f"w{i}")(x)
            x = x1 + x2
            if i != n - 1:
                x = act(x)
        return x


def _pad_t(x, num_pad):
    """Pad the T axis (axis -2) on both ends (pino utils.py add_padding)."""
    if max(num_pad) == 0:
        return x
    pads = [(0, 0)] * x.ndim
    pads[-2] = (num_pad[0], num_pad[1])
    return jnp.pad(x, pads)


def _unpad_t(x, num_pad):
    if max(num_pad) == 0:
        return x
    sl = [slice(None)] * x.ndim
    end = -num_pad[1] if num_pad[1] else None
    sl[-2] = slice(num_pad[0], end)
    return x[tuple(sl)]


class PINObserver2d(nn.Module):
    """lift -> MultiplicativeNet(Re) -> 3-D FNO trunk -> MultiplicativeNet
    -> MLP head (pinobserver.py:129-234)."""
    modes1: Sequence[int]
    modes2: Sequence[int]
    modes3: Sequence[int]
    width: int = 16
    fc_dim: int = 128
    layers: Optional[Sequence[int]] = None
    in_dim: int = 4
    out_dim: int = 1
    act: str = "gelu"
    pad_ratio: Sequence[float] = (0.0, 0.0)
    use_fourier_layer: bool = False
    remat: bool = False   # O(1-layer) activation memory (see PINOTrunk)

    @nn.compact
    def __call__(self, x, re):
        """x: (B, X, Y, T, in_dim); re: (B,) -> (B, X, Y, T, out_dim)."""
        layers = list(self.layers or [self.width] * 4)
        act = get_act(self.act)
        size_t = x.shape[-2]
        num_pad = [round(size_t * r) for r in self.pad_ratio]
        code = re
        if self.use_fourier_layer:
            code = MFNFourierLayer(8, 1.0, name="fourier_re")(
                re.reshape(-1, 1))
        x = nn.Dense(layers[0], name="fc0")(x)
        x = MultiplicativeNet(layers[0], name="mnet1")(x, code)
        x = _pad_t(x, num_pad)
        x = PINOTrunk(layers, self.modes1, self.modes2, self.modes3,
                      self.act, remat=self.remat, name="trunk")(x)
        x = _unpad_t(x, num_pad)
        x = MultiplicativeNet(layers[-1], name="mnet2")(x, code)
        x = nn.Dense(self.fc_dim, name="fc1")(x)
        x = act(x)
        return nn.Dense(self.out_dim, name="fc2")(x)


class PlanePredHead(nn.Module):
    """Shared prediction head: trunk -> unpad -> mnet2 -> MLP
    (pinobserver.py:236-274)."""
    layers: Sequence[int]
    modes1: Sequence[int]
    modes2: Sequence[int]
    modes3: Sequence[int]
    fc_dim: int
    out_dim: int
    act: str = "gelu"

    @nn.compact
    def __call__(self, x, num_pad, code, mnet2):
        act = get_act(self.act)
        x = PINOTrunk(self.layers, self.modes1, self.modes2, self.modes3,
                      self.act, name="trunk")(x)
        x = _unpad_t(x, tuple(num_pad))
        x = mnet2(x, code)
        x = nn.Dense(self.fc_dim, name="fc1")(x)
        x = act(x)
        return nn.Dense(self.out_dim, name="fc2")(x)


class PINObserverFullField(nn.Module):
    """Predict `plane_num` planes at once via a shared head
    (pinobserver.py:276-375).  Output: (B, plane_num*out_dim, X, Y, T)."""
    plane_num: int
    modes1: Sequence[int]
    modes2: Sequence[int]
    modes3: Sequence[int]
    width: int = 16
    fc_dim: int = 128
    layers: Optional[Sequence[int]] = None
    in_dim: int = 4
    out_dim: int = 1
    act: str = "gelu"
    pad_ratio: Sequence[float] = (0.0, 0.0)
    max_re: float = 1000.0

    @nn.compact
    def __call__(self, x, re):
        layers = list(self.layers or [self.width] * 4)
        re = re / self.max_re
        size_t = x.shape[-2]
        num_pad = [round(size_t * r) for r in self.pad_ratio]
        x = nn.Dense(layers[0], name="fc0")(x)
        x = MultiplicativeNet(layers[0], name="mnet1")(x, re)
        x = _pad_t(x, num_pad)
        mnet2 = MultiplicativeNet(layers[-1], name="mnet2")
        head = PlanePredHead(layers, self.modes1, self.modes2, self.modes3,
                             self.fc_dim, self.out_dim * self.plane_num,
                             self.act, name="head")
        pred = head(x, num_pad, re, mnet2)  # (B, X, Y, T, P)
        return jnp.moveaxis(pred, -1, 1)    # (B, P, X, Y, T)


class PolicyModel2D(nn.Module):
    """Residual actuation policy, zero-initialized so it starts as a no-op
    (pinobserver.py:378-433)."""
    modes1: Sequence[int]
    modes2: Sequence[int]
    modes3: Sequence[int]
    width: int = 16
    fc_dim: int = 128
    layers: Optional[Sequence[int]] = None
    in_dim: int = 4
    out_dim: int = 1
    act: str = "gelu"
    pad_ratio: Sequence[float] = (0.0, 0.0)
    max_re: float = 1000.0

    @nn.compact
    def __call__(self, x, re):
        layers = list(self.layers or [self.width] * 4)
        re = re / self.max_re
        size_t = x.shape[-2]
        num_pad = [round(size_t * r) for r in self.pad_ratio]
        x = nn.Dense(layers[0], name="fc0")(x)
        x = MultiplicativeNet(layers[0], name="mnet1")(x, re)
        x = _pad_t(x, num_pad)
        mnet2 = MultiplicativeNet(layers[-1], name="mnet2")
        head = PlanePredHead(layers, self.modes1, self.modes2, self.modes3,
                             self.fc_dim, self.out_dim, self.act,
                             name="head")
        return head(x, num_pad, re, mnet2)

    def zero_init_params(self, params):
        """Zero all parameters (reference zero-inits the whole policy so the
        residual actuation starts at 0, pinobserver.py:432-433)."""
        import jax
        return jax.tree.map(jnp.zeros_like, params)


class DenseNet(nn.Module):
    """Plain MLP (pino FCN.py:30 / libs/utilities3.py:408)."""
    layers: Sequence[int]
    nonlinearity: str = "relu"
    out_nonlinearity: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        act = get_act(self.nonlinearity)
        n = len(self.layers) - 1
        for i in range(n):
            x = nn.Dense(self.layers[i + 1], name=f"fc{i}")(x)
            if i != n - 1:
                x = act(x)
        if self.out_nonlinearity is not None:
            x = get_act(self.out_nonlinearity)(x)
        return x


class LowRank2d(nn.Module):
    """Low-rank integral kernel layer (pino lowrank2d.py:8): psi/phi nets on
    coordinates, rank-r outer contraction over the grid."""
    width: int
    rank: int

    @nn.compact
    def __call__(self, v, a):
        """v: (B, N, width) values; a: (B, N, 2) coordinates."""
        b, n, _ = v.shape
        psi = DenseNet([2, 64, 128, self.width * self.rank],
                       name="psi")(a).reshape(b, n, self.width, self.rank)
        phi = DenseNet([2, 64, 128, self.width * self.rank],
                       name="phi")(a).reshape(b, n, self.width, self.rank)
        coeff = jnp.einsum("bnwr,bnw->br", psi, v) / n
        return jnp.einsum("bnwr,br->bnw", phi, coeff)
