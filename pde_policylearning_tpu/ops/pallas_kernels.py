"""Pallas TPU kernels for the spectral-convolution hot path.

The FNO corner contraction `out[b,kx,ky,o] = sum_i x[b,kx,ky,i] w[i,o,kx,ky]`
is a per-mode (B, I) x (I, O) matmul.  XLA lowers it as 8 separate batched
GEMMs (2 corners x (rr, ri, ir, ii) real components); this kernel fuses all
of them into one VMEM-resident pass — one read of x, one read of w, one
write of out.

Profiling note (SURVEY.md §7 plan A): at research sizes (B~20, C~32) the
op is dispatch/bandwidth bound and XLA's fusion is already near-optimal, so
the Pallas path is opt-in (`backend='pallas'` or interpret tests); it
targets large-batch serving shapes where per-mode GEMMs reach MXU tiles.

Complex data is carried as separate real/imag arrays throughout — the
backend's complex support is unreliable (see CLAUDE.md).
"""
from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _corner_contract_kernel(xr_ref, xi_ref, wr_ref, wi_ref,
                            or_ref, oi_ref):
    """One grid program = one kx mode-row.
    Block shapes: x (1, B, M2, I), w (1, M2, I, O), out (1, B, M2, O)."""
    m2 = xr_ref.shape[2]

    def body(j, _):
        xr = xr_ref[0, :, j, :]
        xi = xi_ref[0, :, j, :]
        wr = wr_ref[0, j, :, :]
        wi = wi_ref[0, j, :, :]
        # complex matmul: (xr + i xi) @ (wr + i wi)
        or_ref[0, :, j, :] = (
            jnp.dot(xr, wr, preferred_element_type=jnp.float32)
            - jnp.dot(xi, wi, preferred_element_type=jnp.float32))
        oi_ref[0, :, j, :] = (
            jnp.dot(xr, wi, preferred_element_type=jnp.float32)
            + jnp.dot(xi, wr, preferred_element_type=jnp.float32))
        return 0

    jax.lax.fori_loop(0, m2, body, 0)


def _corner_contract_impl(xr, xi, wr, wi, interpret: bool = False):
    R, B, M2, I = xr.shape
    O = wr.shape[-1]
    grid = (R,)
    x_spec = pl.BlockSpec((1, B, M2, I), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((1, M2, I, O), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((1, B, M2, O), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _corner_contract_kernel,
        grid=grid,
        in_specs=[x_spec, x_spec, w_spec, w_spec],
        out_specs=[o_spec, o_spec],
        out_shape=[jax.ShapeDtypeStruct((R, B, M2, O), jnp.float32),
                   jax.ShapeDtypeStruct((R, B, M2, O), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=8 * R * M2 * B * I * O,
            bytes_accessed=4 * (2 * R * B * M2 * I + 2 * R * M2 * I * O
                                + 2 * R * B * M2 * O),
            transcendentals=0),
        interpret=interpret,
    )(xr, xi, wr, wi)


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def corner_contract(xr, xi, wr, wi, interpret: bool = False):
    """Fused per-mode complex contraction (differentiable).

    xr, xi: (R, B, M2, I) stacked corner rows (R = total kx modes across
    corners); wr, wi: (R, M2, I, O).  Returns (or_, oi_) (R, B, M2, O).

    The VJP is two more corner contractions (the transposes of a complex
    GEMM), so training also runs through the fused kernel:
      dx = dout @ conj(w)^T,   dw = conj(x)^T @ dout.
    """
    return _corner_contract_impl(xr, xi, wr, wi, interpret)


def _corner_contract_fwd(xr, xi, wr, wi, interpret):
    out = _corner_contract_impl(xr, xi, wr, wi, interpret)
    return out, (xr, xi, wr, wi)


def _corner_contract_bwd(interpret, res, cots):
    xr, xi, wr, wi = res
    dor, doi = cots
    # dx = dout @ conj(w)^T : per-mode (B,O) @ (O,I)
    wrT = jnp.swapaxes(wr, -1, -2)
    wiT = jnp.swapaxes(wi, -1, -2)
    dxr, dxi = _corner_contract_impl(dor, doi, wrT, -wiT, interpret)
    # dw = conj(x)^T @ dout : per-mode (I,B) @ (B,O); reuse the kernel with
    # the channel axis playing the "batch" role
    xrT = jnp.transpose(xr, (0, 3, 2, 1))    # (R, I, M2, B)
    xiT = jnp.transpose(xi, (0, 3, 2, 1))
    dorM = jnp.transpose(dor, (0, 2, 1, 3))  # (R, M2, B, O)
    doiM = jnp.transpose(doi, (0, 2, 1, 3))
    dwr, dwi = _corner_contract_impl(xrT, -xiT, dorM, doiM, interpret)
    # kernel emits (R, I, M2, O); weights live as (R, M2, I, O)
    dwr = jnp.transpose(dwr, (0, 2, 1, 3))
    dwi = jnp.transpose(dwi, (0, 2, 1, 3))
    return dxr, dxi, dwr, dwi


corner_contract.defvjp(_corner_contract_fwd, _corner_contract_bwd)


def spectral_conv_2d_pallas(x, weights, half_modes: Sequence[int],
                            fft_norm: str = "backward",
                            bias=None,
                            output_sizes: Sequence[int] = None,
                            interpret: bool = False):
    """2-D spectral convolution with the fused Pallas corner contraction.

    Drop-in for `ops.fourier.spectral_conv_nd` in the 2-D dense-weight
    case.  x: (B, H, W, C_in); weights: [low, high] dense weight pytrees
    ({'tensor': (2, I, O, m1, m2)}).
    """
    from . import factorized
    from .fourier import irfftn, rfftn

    m1, m2 = half_modes
    B, H, W, Cin = x.shape
    x_ft = rfftn(x.astype(jnp.float32), axes=(1, 2), norm=fft_norm)
    corners = jnp.concatenate([x_ft[:, :m1, :m2, :],
                               x_ft[:, -m1:, :m2, :]], axis=1)
    # (R=2*m1, B, M2, I)
    xr = jnp.moveaxis(corners.real, 0, 1)
    xi = jnp.moveaxis(corners.imag, 0, 1)
    ws = [factorized.to_dense(w) for w in weights]  # (I, O, m1, m2)
    w_all = jnp.concatenate(ws, axis=2)             # (I, O, 2*m1, m2)
    w_all = jnp.transpose(w_all, (2, 3, 0, 1))      # (R, M2, I, O)
    or_, oi_ = corner_contract(xr, xi, w_all.real.astype(jnp.float32),
                               w_all.imag.astype(jnp.float32), interpret)
    out_c = jax.lax.complex(jnp.moveaxis(or_, 1, 0),
                            jnp.moveaxis(oi_, 1, 0))  # (B, R, M2, O)
    Cout = out_c.shape[-1]
    Wr = W // 2 + 1
    low = jax.lax.pad(out_c[:, :m1], jnp.zeros((), out_c.dtype),
                      [(0, 0, 0), (0, H - m1, 0), (0, Wr - m2, 0),
                       (0, 0, 0)])
    high = jax.lax.pad(out_c[:, m1:], jnp.zeros((), out_c.dtype),
                       [(0, 0, 0), (H - m1, 0, 0), (0, Wr - m2, 0),
                        (0, 0, 0)])
    out_ft = low + high
    out_sizes = tuple(output_sizes) if output_sizes is not None else (H, W)
    out = irfftn(out_ft, s=out_sizes, axes=(1, 2), norm=fft_norm)
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype) if x.dtype != jnp.float32 else out
