"""Recurrent Neural Operator (GRU with Fourier-layer gates).

reference: neuralop/models/rno.py — SpectralConv2d(:34), SpectralConvWithFC
(:80), SpectralRegressor(:109), FourierLayer2d(:215), RNO_cell(:231),
RNO_layer(:263), RNO2d(:293).

TPU re-design:
* the reference unrolls timesteps in a Python loop (rno.py:282-285); here the
  recurrence is a `jax.lax.scan` with the hidden state as carry — one
  compiled step reused for every t, O(1) compile size in sequence length;
* autoregressive `predict` (rno.py:370-379) likewise scans, feeding the
  prediction back as the next input;
* channels-last layout; the per-cell 8 Fourier layers batch their spectral
  contractions over the gates.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import factorized, fourier


class RNOSpectralConv2d(nn.Module):
    """2-D spectral conv keeping modes1 rows (both signs) x modes2 cols,
    'ortho' norm (rno.py:34-77)."""
    in_channels: int
    out_channels: int
    modes1: int
    modes2: int
    norm: str = "ortho"

    @nn.compact
    def __call__(self, x):
        # xavier-normal with gain scale*sqrt(in+out) as in rno.py:42-48:
        # std = gain * sqrt(2/(fan_in+fan_out)) = sqrt(2)/(in*out)
        std = (2.0 ** 0.5) / (self.in_channels * self.out_channels)
        shape = (self.in_channels, self.out_channels, self.modes1, self.modes2)
        ws = [
            self.param(f"w{i}",
                       lambda key: factorized.init_factorized(
                           key, shape, "dense", std=std))
            for i in range(2)
        ]
        return fourier.spectral_conv_nd(
            x, ws, (self.modes1, self.modes2), fft_norm=self.norm)


class FourierLayer2d(nn.Module):
    """Spectral conv + pointwise linear skip (rno.py:215-228)."""
    modes1: int
    modes2: int
    width: int

    @nn.compact
    def __call__(self, x):
        x1 = RNOSpectralConv2d(self.width, self.width, self.modes1,
                               self.modes2, name="spec_conv")(x)
        x2 = nn.Dense(self.width, name="pointwise")(x)
        return x1 + x2


class RNOCell(nn.Module):
    """GRU cell whose gates are Fourier layers (rno.py:231-260):
    z = sig(f1(x)+f2(h)+b1); z2 = sig(f7(x)+f8(h)+b4);
    r = sig(f3(x)+f4(h)+b2); h_hat = selu(f5(x)+f6(r*h)+b3);
    h' = (1-z)*h + z2*h_hat.
    """
    modes1: int
    modes2: int
    width: int

    @nn.compact
    def __call__(self, x, h):
        F = lambda name: FourierLayer2d(self.modes1, self.modes2, self.width,
                                        name=name)
        normal = nn.initializers.normal(1.0)
        b1 = self.param("b1", normal, ())
        b2 = self.param("b2", normal, ())
        b3 = self.param("b3", normal, ())
        b4 = self.param("b4", normal, ())
        z = nn.sigmoid(F("f1")(x) + F("f2")(h) + b1)
        z2 = nn.sigmoid(F("f7")(x) + F("f8")(h) + b4)
        r = nn.sigmoid(F("f3")(x) + F("f4")(h) + b2)
        h_hat = nn.selu(F("f5")(x) + F("f6")(r * h) + b3)
        return (1.0 - z) * h + z2 * h_hat


class _RNOScanStep(nn.Module):
    """One scan step: (carry=h, x_t) -> (h', h')."""
    modes1: int
    modes2: int
    width: int

    @nn.compact
    def __call__(self, carry, xt):
        h = RNOCell(self.modes1, self.modes2, self.width, name="cell")(
            xt, carry)
        return h, h


class RNOLayer(nn.Module):
    """Scan an RNOCell over time (rno.py:263-290).

    x: (B, T, H, W, C) -> (B, T, H, W, C) if return_sequences else
    (B, H, W, C) final hidden state.
    """
    modes1: int
    modes2: int
    width: int
    return_sequences: bool = False
    remat: bool = False  # rematerialize the cell in the backward pass:
    # activation memory O(T) -> O(1) per layer (SURVEY.md §7 'recurrent
    # training memory')

    @nn.compact
    def __call__(self, x, h: Optional[jnp.ndarray] = None):
        B, T, H, W, C = x.shape
        bias_h = self.param("bias_h", nn.initializers.normal(1.0), ())
        if h is None:
            h = jnp.zeros((B, H, W, self.width), x.dtype) + bias_h
        step_cls = nn.remat(_RNOScanStep) if self.remat else _RNOScanStep
        scan_cell = nn.scan(
            step_cls,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1, out_axes=1,
        )(self.modes1, self.modes2, self.width, name="scan")
        h_final, ys = scan_cell(h, x)
        if self.return_sequences:
            return ys
        return h_final


class SpectralConvWithFC(nn.Module):
    """Linear residual + spectral conv + activation (rno.py:80-106)."""
    in_channels: int
    out_channels: int
    modes1: int
    modes2: int
    dropout: float = 0.1
    activation: str = "silu"
    last_activation: bool = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        res = nn.Dense(self.out_channels, name="linear")(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = RNOSpectralConv2d(self.in_channels, self.out_channels,
                              self.modes1, self.modes2, name="spec_conv")(x)
        out = x + res
        if not self.last_activation:
            return out
        act = nn.silu if self.activation == "silu" else nn.relu
        return act(out)


class SpectralRegressor(nn.Module):
    """FNO-style regression head (rno.py:109-212): optional spatial fc,
    `num_spectral_layers` SpectralConvWithFC blocks, then a 2-layer MLP."""
    n_hidden: int
    freq_dim: int
    out_dim: int
    modes: int
    num_spectral_layers: int = 2
    dim_feedforward: Optional[int] = None
    spacial_fc: bool = False
    spacial_dim: int = 2
    activation: str = "silu"
    last_activation: bool = True
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, grid=None, deterministic: bool = True):
        if self.spacial_fc:
            x = jnp.concatenate([x, grid], axis=-1)
            x = nn.Dense(self.n_hidden, name="fc")(x)
        width_in = self.n_hidden
        for i in range(self.num_spectral_layers):
            last = (i == self.num_spectral_layers - 1)
            x = SpectralConvWithFC(
                width_in if i == 0 else self.freq_dim, self.freq_dim,
                self.modes, self.modes,
                dropout=self.dropout, activation=self.activation,
                last_activation=(self.last_activation or not last),
                name=f"spec{i}")(x, deterministic=deterministic)
        dim_ff = self.dim_feedforward or 2 * self.spacial_dim * self.freq_dim
        act = nn.silu if self.activation == "silu" else nn.relu
        x = nn.Dense(dim_ff, name="reg0")(x)
        x = act(x)
        return nn.Dense(self.out_dim, name="reg1")(x)


class RNO2d(nn.Module):
    """Stacked RNO with residual inter-layer connections and a spectral
    regression head (rno.py:293-379).

    `__call__(x)` runs `timestep` autoregressive steps and returns the
    prediction at `recurrent_index` — matching the reference `forward`.
    x: (B, T, H, W, in_dim).
    """
    modes1: int
    modes2: int
    width: int
    recurrent_index: int = 0
    layer_num: int = 3
    in_dim: int = 1
    out_dim: int = 1
    pad_amount: Optional[Sequence[int]] = None
    pad_dim: str = "1"
    remat: bool = False

    def setup(self):
        self.input_projection = nn.Dense(
            self.width,
            kernel_init=nn.initializers.normal(1.0),
            name="input_projection")
        rno_layers = []
        for i in range(self.layer_num):
            rno_layers.append(RNOLayer(
                self.modes1, self.modes2, self.width,
                return_sequences=(i < self.layer_num - 1),
                remat=self.remat,
                name=f"layer{i}"))
        self.rno_layers = rno_layers
        self.regressor = SpectralRegressor(
            n_hidden=self.width, freq_dim=self.width, out_dim=self.out_dim,
            modes=self.modes2, activation="relu", dropout=0.3,
            name="regressor")

    def _pad(self, x):
        if not self.pad_amount:
            return x
        pads = [(0, 0)] * x.ndim
        # spatial dims are (..., H, W, C): H at -3, W at -2
        if self.pad_dim in ("1", "both"):
            pads_h = list(pads)
            pads_h[-3] = (0, self.pad_amount[0])
            x = jnp.pad(x, pads_h)
        if self.pad_dim in ("2", "both"):
            pads_w = [(0, 0)] * x.ndim
            pads_w[-2] = (0, self.pad_amount[1])
            x = jnp.pad(x, pads_w)
        return x

    def _unpad(self, h):
        if not self.pad_amount:
            return h
        if self.pad_dim in ("1", "both"):
            h = h[:, :-self.pad_amount[0], :, :]
        if self.pad_dim in ("2", "both"):
            h = h[:, :, :-self.pad_amount[1], :]
        return h

    def forward_one_step(self, x, init_hidden_states=None,
                         deterministic: bool = True):
        """x: (B, T, H, W, in_dim) -> (pred (B, H, W, out_dim), states)."""
        if init_hidden_states is None:
            init_hidden_states = [None] * self.layer_num
        x = self.input_projection(x)
        x = self._pad(x)
        final_states = []
        for i, layer in enumerate(self.rno_layers):
            pred = layer(x, init_hidden_states[i])
            if i < self.layer_num - 1:
                x = x + pred  # residual over the sequence (rno.py:344)
                final_states.append(x[:, -1])
            else:
                x = pred
                final_states.append(x)
        h = self._unpad(x)
        pred = self.regressor(h, deterministic=deterministic)
        return pred, final_states

    def predict(self, x, num_steps: int, deterministic: bool = True):
        """Autoregressive rollout (rno.py:370-379): the first step consumes
        the full input sequence; each later step feeds the previous
        prediction back as a 1-step sequence."""
        outputs = []
        states = None
        for _ in range(num_steps):
            pred, states = self.forward_one_step(
                x, states, deterministic=deterministic)
            outputs.append(pred)
            x = pred[:, None]  # (B, 1, H, W, out_dim)
        return jnp.stack(outputs, axis=1)

    def __call__(self, x, v_plane=None, timestep: Optional[int] = None,
                 deterministic: bool = True):
        """timestep=None follows the reference exactly: rno.py:365 shadows
        the `timestep=2` default with the input's sequence length, so the
        rollout is always x.shape[1] steps.  Passing an int overrides (a
        capability the reference's shadowed parameter can't express)."""
        if timestep is None:
            timestep = x.shape[1]
        preds = self.predict(x, num_steps=timestep,
                             deterministic=deterministic)
        return preds[:, self.recurrent_index]
