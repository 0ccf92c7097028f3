"""DINo: implicit-neural-representation forecaster.

reference: libs/DINo/ode_model.py:21-46 (Derivative, Decoder),
libs/DINo/network.py:96-130 (MLP, SetEncoder), train flow in
train_dino.py.

Model: a FourierNet INR decodes (coordinates, latent code) -> field value;
an MLP vector field evolves the latent codes in time; forecasting = RK4
integration of the code ODE + decoding (the reference uses torchdiffeq —
here a fixed-step RK4 under lax.scan).
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .mfn import FourierNet


class SwishMLP(nn.Module):
    """4-layer swish MLP (DINo network.py:96-110)."""
    hidden_size: int
    out_size: Optional[int] = None

    @nn.compact
    def __call__(self, x):
        in_size = x.shape[-1]
        out = self.out_size or in_size
        for i, width in enumerate([self.hidden_size] * 3):
            x = nn.Dense(width, name=f"fc{i}")(x)
            x = nn.swish(x)
        return nn.Dense(out, name="fc3")(x)


class Derivative(nn.Module):
    """Latent-code vector field du/dt = MLP(u) (ode_model.py:21-28)."""
    state_c: int
    code_c: int
    hidden_c: int

    @nn.compact
    def __call__(self, t, u):
        return SwishMLP(self.hidden_c, name="net")(u)


class Decoder(nn.Module):
    """INR decoder: FourierNet(coords, code) -> value (ode_model.py:31-46)."""
    state_c: int
    hidden_c: int
    code_c: int
    coord_dim: int
    n_layers: int = 3

    @nn.compact
    def __call__(self, x, codes):
        """x: (..., coord_dim); codes: (B, code_dim) broadcastable."""
        return FourierNet(self.hidden_c, 1, self.n_layers, input_scale=64.0,
                          name="net")(x, codes)


class SetEncoder(nn.Module):
    """Aggregate n_cond per-frame codes into one (network.py:113-130)."""
    code_size: int
    n_cond: int
    hidden_size: int
    out_size: Optional[int] = None

    @nn.compact
    def __call__(self, x):
        """x: (B, n_cond, code_size) -> (B, out_size)."""
        h = SwishMLP(self.hidden_size, self.out_size, name="net")(x)
        # Conv1d(code, code, n_cond) over the condition axis == weighted sum
        w = self.param("ave_kernel", nn.initializers.lecun_normal(),
                       (self.n_cond, h.shape[-1], h.shape[-1]))
        b = self.param("ave_bias", nn.initializers.zeros, (h.shape[-1],))
        out = jnp.einsum("bnc,ncd->bd", h, w) + b
        return out


def odeint_rk4(f: Callable, y0, ts, params=None):
    """Fixed-step RK4 over the time grid `ts` (replaces torchdiffeq rk4,
    train_dino.py:234-236).  f(t, y) -> dy/dt.  Returns (T, *y0.shape)."""
    def step(y, t_pair):
        t0, t1 = t_pair
        h = t1 - t0
        k1 = f(t0, y)
        k2 = f(t0 + h / 2, y + h / 2 * k1)
        k3 = f(t0 + h / 2, y + h / 2 * k2)
        k4 = f(t1, y + h * k3)
        y1 = y + h / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
        return y1, y1

    pairs = jnp.stack([ts[:-1], ts[1:]], axis=-1)
    _, ys = jax.lax.scan(step, y0, pairs)
    return jnp.concatenate([y0[None], ys], axis=0)
