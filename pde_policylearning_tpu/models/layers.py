"""Shared model layers: lifting/projection, channel-MLP, skips, norms.

reference: neuralop/models/tfno.py:11-38 (Lifting/Projection),
neuralop/models/mlp.py:10 (MLP), neuralop/models/skip_connections.py:5-61,
neuralop/models/normalization_layers.py:5 (AdaIN).

Layout: channels-last (B, d1..dN, C).  The reference's 1x1 ConvNd layers are
plain Dense layers over the trailing channel axis here — rank-agnostic and
exactly the MXU-shaped matmul XLA wants.
"""
from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp


class Lifting(nn.Module):
    """Pointwise lift to hidden width (tfno.py:11)."""
    out_channels: int

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.out_channels, name="fc")(x)


class Projection(nn.Module):
    """Two-layer pointwise projection head (tfno.py:23)."""
    out_channels: int
    hidden_channels: Optional[int] = None
    non_linearity: Callable = nn.gelu

    @nn.compact
    def __call__(self, x):
        hidden = self.hidden_channels or x.shape[-1]
        x = nn.Dense(hidden, name="fc1")(x)
        x = self.non_linearity(x)
        return nn.Dense(self.out_channels, name="fc2")(x)


class ChannelMLP(nn.Module):
    """n-layer pointwise MLP used inside FNO blocks (mlp.py:10).

    Matches the reference behavior of applying the non-linearity after
    *every* layer (its `i < n_layers` is always true)."""
    out_channels: Optional[int] = None
    hidden_channels: Optional[int] = None
    n_layers: int = 2
    non_linearity: Callable = nn.gelu
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        in_ch = x.shape[-1]
        out_ch = self.out_channels or in_ch
        hidden = self.hidden_channels or in_ch
        for i in range(self.n_layers):
            width = out_ch if i == self.n_layers - 1 else hidden
            x = nn.Dense(width, name=f"fc{i}")(x)
            x = self.non_linearity(x)
            if self.dropout > 0:
                x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class SoftGating(nn.Module):
    """Learned per-channel gate (skip_connections.py:38)."""
    channels: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.channels,))
        if self.use_bias:
            b = self.param("bias", nn.initializers.ones, (self.channels,))
            return w * x + b
        return w * x


class SkipConnection(nn.Module):
    """'linear' (1x1 conv) / 'identity' / 'soft-gating'
    (skip_connections.py:5)."""
    out_channels: int
    skip_type: str = "soft-gating"

    @nn.compact
    def __call__(self, x):
        t = self.skip_type.lower()
        if t == "identity":
            return x
        if t == "linear":
            return nn.Dense(self.out_channels, use_bias=False, name="conv")(x)
        if t == "soft-gating":
            return SoftGating(self.out_channels, name="gate")(x)
        raise ValueError(f"Got skip type {self.skip_type!r}")


def instance_norm(x, eps: float = 1e-5):
    """InstanceNorm over spatial dims, no affine (torch default)."""
    axes = tuple(range(1, x.ndim - 1))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps)


class GroupNorm(nn.Module):
    """GroupNorm with one group (== LayerNorm over channel+space, affine)."""
    channels: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        axes = tuple(range(1, x.ndim))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.var(x, axis=axes, keepdims=True)
        xn = (x - mean) / jnp.sqrt(var + self.eps)
        w = self.param("scale", nn.initializers.ones, (self.channels,))
        b = self.param("bias", nn.initializers.zeros, (self.channels,))
        return xn * w + b


class AdaIN(nn.Module):
    """Adaptive instance norm conditioned on an embedding
    (normalization_layers.py:5).  The embedding is a call argument rather
    than mutable module state (`set_embedding`) — functional style."""
    in_channels: int
    mlp_hidden: int = 512
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, embedding):
        h = nn.Dense(self.mlp_hidden, name="mlp0")(embedding.reshape(-1))
        h = nn.gelu(h)
        wb = nn.Dense(2 * self.in_channels, name="mlp1")(h)
        weight, bias = wb[: self.in_channels], wb[self.in_channels:]
        axes = tuple(range(1, x.ndim))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.var(x, axis=axes, keepdims=True)
        xn = (x - mean) / jnp.sqrt(var + self.eps)
        return xn * weight + bias
