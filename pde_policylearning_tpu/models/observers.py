"""Observer model zoo: wall-pressure -> off-wall velocity models.

reference: libs/models/fno_models.py:16 (FNO2dObserver),
libs/models/rno_models.py:12 (RNO2dObserver), libs/unet_models.py:94 (UNet).

All observers take channels-last planes: p_plane (B, H, W, 1) [and optionally
v_plane], append a normalized coordinate grid, and regress the target plane.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from .fno import FNO
from .rno import RNO2d, RNOSpectralConv2d


def make_grid(shape):
    """Normalized (x, y) coordinate channels for (B, H, W, ...) inputs
    (fno_models.py:51-57)."""
    b, h, w = shape[0], shape[1], shape[2]
    gx = jnp.linspace(0, 1, h).reshape(1, h, 1, 1)
    gy = jnp.linspace(0, 1, w).reshape(1, 1, w, 1)
    gx = jnp.broadcast_to(gx, (b, h, w, 1))
    gy = jnp.broadcast_to(gy, (b, h, w, 1))
    return jnp.concatenate([gx, gy], axis=-1)


class FNO2dObserver(nn.Module):
    """p_plane [+ v_plane] + grid -> FNO2d -> target plane
    (fno_models.py:16-57)."""
    modes1: int
    modes2: int
    width: int
    use_v_plane: bool = False
    reference_act_quirk: bool = False  # see models/fno.py FNOBlocks

    @nn.compact
    def __call__(self, p_plane, v_plane=None):
        if p_plane.ndim == 3:
            p_plane = p_plane[..., None]
        grid = make_grid(p_plane.shape).astype(p_plane.dtype)
        feats = [p_plane]
        if self.use_v_plane:
            if v_plane.ndim == 3:
                v_plane = v_plane[..., None]
            feats.append(v_plane)
        feats.append(grid)
        x = jnp.concatenate(feats, axis=-1)
        fno = FNO(
            n_modes=(self.modes1, self.modes2),
            hidden_channels=self.width,
            in_channels=x.shape[-1],
            out_channels=1,
            reference_act_quirk=self.reference_act_quirk,
            name="fno2d",
        )
        return fno(x)


class RNO2dObserver(nn.Module):
    """Thin wrapper over RNO2d (rno_models.py:12-15)."""
    modes1: int
    modes2: int
    width: int
    recurrent_index: int = 0
    layer_num: int = 1
    pad_amount: Optional[tuple] = None
    pad_dim: str = "1"

    @nn.compact
    def __call__(self, p_plane, v_plane=None, timestep: Optional[int] = None,
                 deterministic: bool = True):
        rno = RNO2d(self.modes1, self.modes2, self.width,
                    recurrent_index=self.recurrent_index,
                    layer_num=self.layer_num,
                    pad_amount=self.pad_amount, pad_dim=self.pad_dim,
                    name="rno")
        return rno(p_plane, v_plane, timestep=timestep,
                   deterministic=deterministic)


class DoubleConv(nn.Module):
    """(conv3x3 -> BN -> relu) x 2 (unet_models DoubleConv)."""
    out_channels: int
    mid_channels: Optional[int] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.mid_channels or self.out_channels
        x = nn.Conv(mid, (3, 3), padding=1, use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        return nn.relu(x)


class UNet(nn.Module):
    """Encoder-decoder observer with optional spectral conv in the last
    up-block (libs/unet_models.py:94-135)."""
    n_classes: int = 1
    bilinear: bool = False
    use_v_plane: bool = False
    use_spectral_conv: bool = True
    modes: int = 12

    @nn.compact
    def __call__(self, p_plane, v_plane=None, train: bool = False):
        if p_plane.ndim == 3:
            p_plane = p_plane[..., None]
        grid = make_grid(p_plane.shape).astype(p_plane.dtype)
        x = jnp.concatenate([p_plane, grid], axis=-1)
        x1 = nn.Dense(32, name="inc")(x)

        def down(x, ch, name):
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            return DoubleConv(ch, name=name)(x, train=train)

        factor = 2 if self.bilinear else 1
        x2 = down(x1, 64, "down1")
        x3 = down(x2, 128, "down2")
        x4 = down(x3, 256, "down3")
        x5 = down(x4, 512 // factor, "down4")

        def up(x_small, x_skip, ch, name, spectral=False):
            if self.bilinear:
                b, h, w, c = x_small.shape
                x_up = jnp.repeat(jnp.repeat(x_small, 2, axis=1), 2, axis=2)
            else:
                x_up = nn.ConvTranspose(
                    x_small.shape[-1] // 2, (2, 2), strides=(2, 2),
                    name=f"{name}_tconv")(x_small)
            dh = x_skip.shape[1] - x_up.shape[1]
            dw = x_skip.shape[2] - x_up.shape[2]
            x_up = jnp.pad(x_up, ((0, 0), (dh // 2, dh - dh // 2),
                                  (dw // 2, dw - dw // 2), (0, 0)))
            x = jnp.concatenate([x_skip, x_up], axis=-1)
            if spectral:
                return RNOSpectralConv2d(x.shape[-1], ch, self.modes,
                                         self.modes, name=f"{name}_spec")(x)
            return DoubleConv(ch, name=name)(x, train=train)

        x = up(x5, x4, 256 // factor, "up1")
        x = up(x, x3, 128 // factor, "up2")
        x = up(x, x2, 64 // factor, "up3")
        x = up(x, x1, 32, "up4", spectral=self.use_spectral_conv)
        return nn.Dense(self.n_classes, name="outc")(x)
