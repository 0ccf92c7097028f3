"""Multiplicative filter networks (shared by PINO conditioning and DINo INR).

reference: libs/models/pino_models/pinobserver.py:14-129 and
libs/DINo/network.py:45-190 (MultiplicativeNet, FourierLayer/FourierNet MFN).
"""
from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def _kaiming_uniform(key, shape, dtype=jnp.float32):
    # torch kaiming_uniform_(a=sqrt(5)) on (out, in): bound = 1/sqrt(in)
    import jax
    fan_in = shape[-1]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class MultiplicativeNet(nn.Module):
    """out = x1 @ B^T + code @ A^T + bias, broadcasting the code term over
    the spatial axes (pinobserver.py:14-63)."""
    out_features: int

    @nn.compact
    def __call__(self, x1, code):
        """x1: (B, *spatial, I); code: (B, J) or (B,) -> (B, *spatial, O)."""
        if code.ndim < 2:
            code = code[..., None]
        in1 = x1.shape[-1]
        in2 = code.shape[-1]
        A = self.param("A", _kaiming_uniform, (self.out_features, in2))
        B = self.param("B", _kaiming_uniform, (self.out_features, in1))
        bound = 1.0 / math.sqrt(in1)
        bias = self.param(
            "bias",
            lambda key: _kaiming_uniform(key, (self.out_features,)) * 1.0)
        bias_code = jnp.einsum("bj,oj->bo", code, A)
        bias_code = bias_code.reshape(
            code.shape[0], *([1] * (x1.ndim - 2)), self.out_features)
        lin = jnp.einsum("...i,oi->...o", x1, B)
        return lin + bias_code + bias


class MFNFourierLayer(nn.Module):
    """Sine/cosine filter (pinobserver.py:96-112)."""
    out_features: int  # total (half sin, half cos)
    weight_scale: float = 1.0

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", _kaiming_uniform,
                       (self.out_features // 2, x.shape[-1]))
        lin = jnp.einsum("...i,oi->...o", x, w * self.weight_scale)
        return jnp.concatenate([jnp.sin(lin), jnp.cos(lin)], axis=-1)


class FourierNet(nn.Module):
    """MFN with Fourier filters: out = Linear(prod_i filter_i(x) *
    bilinear_i(code)) (pinobserver.py:66-129 / DINo network.py:132-190)."""
    hidden_size: int
    out_size: int
    n_layers: int = 3
    input_scale: float = 256.0

    @nn.compact
    def __call__(self, x, code):
        scale = self.input_scale / np.sqrt(self.n_layers + 1)
        out = MFNFourierLayer(self.hidden_size, scale, name="filter0")(x) \
            * MultiplicativeNet(self.hidden_size, name="bilinear0")(
                x * 0.0, code)
        for i in range(1, self.n_layers + 1):
            out = MFNFourierLayer(self.hidden_size, scale,
                                  name=f"filter{i}")(x) \
                * MultiplicativeNet(self.hidden_size,
                                    name=f"bilinear{i}")(out, code)
        out = nn.Dense(self.out_size, name="output")(out)
        if out.shape[-1] == 1:
            out = out.squeeze(-1)
        return out
