"""Spectral convolution core ops (channels-last, XLA/TPU-first).

The N-D factorized spectral convolution: rfftn -> truncated-corner complex
contraction -> irfftn (reference: neuralop/models/spectral_convolution.py:143,
303-347).  Re-designed for TPU:

* channels-last ``(B, d1..dN, C)`` activations so the channel contraction is
  the innermost (lane) dimension and maps onto the MXU;
* the reference zero-fills the full output spectrum and scatter-writes each
  corner (`out_fft[idx] = ...`) — a pattern XLA tiles poorly.  Here each
  contracted corner is placed with a static `jax.lax.pad` and the (<=4)
  padded spectra are summed; XLA fuses this into the irfft input.
* no data-dependent shapes anywhere: mode counts are static Python ints.
"""
from __future__ import annotations

import itertools
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from . import factorized


def rfftn(x: jnp.ndarray, axes, norm: str = "backward") -> jnp.ndarray:
    """rfftn with *static* normalization.

    jnp.fft's `norm=` kwarg materializes the scale as a device-side int
    reduction, which the TPU runtime rejects in eager mode (observed:
    UNIMPLEMENTED on v5e).  Shapes are static under jit anyway, so the
    scale is a Python float folded into the graph for free.
    """
    out = jnp.fft.rfftn(x, axes=axes)
    if norm == "backward":
        return out
    n = 1
    for a in axes:
        n *= x.shape[a]
    if norm == "forward":
        return out * (1.0 / n)
    if norm == "ortho":
        return out * (1.0 / n ** 0.5)
    raise ValueError(f"Unknown fft norm {norm!r}")


def irfftn(x_ft: jnp.ndarray, s, axes, norm: str = "backward") -> jnp.ndarray:
    out = jnp.fft.irfftn(x_ft, s=tuple(s), axes=axes)
    if norm == "backward":
        return out
    n = 1
    for size in s:
        n *= size
    if norm == "forward":
        return out * float(n)
    if norm == "ortho":
        return out * (n ** 0.5)
    raise ValueError(f"Unknown fft norm {norm!r}")


def corner_slices(half_modes: Sequence[int]) -> list[tuple[slice, ...]]:
    """Spectral-corner slice tuples over the mode axes, in the reference's
    weight enumeration order (spectral_convolution.py:330-337): the last
    (rfft) axis keeps only low modes; every other axis contributes a
    (low, high) pair, enumerated with itertools.product."""
    per_dim = [
        ((slice(None, m)), (slice(-m, None))) for m in half_modes[:-1]
    ] + [(slice(None, half_modes[-1]),)]
    return [tuple(c) for c in itertools.product(*per_dim)]


def _pad_config(corner: tuple[slice, ...], spectrum_shape: Sequence[int]):
    """lax.pad config placing a corner block back into the full spectrum."""
    cfg = []
    for sl, full in zip(corner, spectrum_shape):
        if sl.start is None:  # low corner [:m]
            m = sl.stop
            cfg.append((0, full - m, 0))
        else:  # high corner [-m:]
            m = -sl.start
            cfg.append((full - m, 0, 0))
    return cfg


def _dft_mats(size: int, half: int, last: bool, dtype):
    """Truncated DFT factor matrices for one axis: rows = kept frequencies
    ([0..h) plus [size-h..size) for full-fft axes; [0..h) for the rfft
    axis), columns = grid points.  Returned as (cos, sin) of the forward
    angle -2*pi*f*n/size, so F = cos + i*sin."""
    import numpy as np
    n = np.arange(size)
    if last:
        f = np.arange(half)
    else:
        f = np.concatenate([np.arange(half), np.arange(size - half, size)])
    ang = -2.0 * np.pi * np.outer(f, n) / size
    return (jnp.asarray(np.cos(ang), dtype), jnp.asarray(np.sin(ang), dtype))


def _idft_mats(size: int, half: int, last: bool, out_size: int, dtype):
    """Inverse factor matrices for one axis with resampling, replicating
    jnp.fft.irfftn(..., s=out_sizes) EXACTLY: the input-sized spectrum is
    truncated/zero-padded at the END of each axis before inversion, so a
    kept row whose spectrum index is k contributes frequency k over the
    OUT grid (for out_size == size this reduces to the usual
    negative-frequency reading of the high corner), and rows with
    k >= spectrum budget are dropped.  Rows on the rfft axis carry the
    conjugate-pair doubling for the OUT length.  Returned as (cos, sin)
    of the forward angle, i.e. the inverse kernel is C - i*S."""
    import numpy as np
    if last:
        f = np.arange(half)
        budget = out_size // 2 + 1
    else:
        f = np.concatenate([np.arange(half), np.arange(size - half, size)])
        budget = out_size
    n = np.arange(out_size)
    ang = -2.0 * np.pi * np.outer(f % max(out_size, 1), n) / out_size
    keep = (f < budget).astype(np.float64)[:, None]
    C = np.cos(ang) * keep
    S = np.sin(ang) * keep
    if last:
        c = np.full(half, 2.0)
        c[0] = 1.0
        if out_size % 2 == 0:
            c[f == out_size // 2] = 1.0
        C = C * c[:, None]
        S = S * c[:, None]
    return jnp.asarray(C, dtype), jnp.asarray(S, dtype)


def truncated_dft_conv_nd(
    x: jnp.ndarray,
    weights: Sequence[dict],
    half_modes: Sequence[int],
    *,
    fft_norm: str = "backward",
    bias: Optional[jnp.ndarray] = None,
    output_sizes: Optional[Sequence[int]] = None,
) -> jnp.ndarray:
    """Spectral convolution computed as a truncated-DFT matmul sandwich —
    no FFT at all.

    Rationale (TPU): XLA's TPU FFT runs ~30x below the HBM roofline, and an
    FNO layer only KEEPS `half_modes` frequencies anyway.  Projecting each
    spatial axis onto its kept modes with a (modes x size) DFT matrix is a
    chain of MXU matmuls: measured 2.9x faster than the rfftn/irfftn path
    on the PINO trunk shape (B4 64x64x17 C64 h4, v5e; NOTES_r2), exact to
    f32.  Semantics identical to `spectral_conv_nd` for output_sizes=None,
    separable=False (reference: neuralop/models/spectral_convolution.py:
    303-347).

    Since the full spectrum is never materialized, normalization reduces to
    one static scale: backward/forward/ortho all collapse to 1/prod(sizes)
    when input and output sizes agree; with `output_sizes` (the up/down-
    scaling layers) the scale follows the rfftn(norm)/irfftn(norm) pair and
    the inverse matrices replicate irfftn's pad/truncate-at-end semantics
    exactly (see _idft_mats).
    """
    order = len(half_modes)
    spatial = x.shape[1:1 + order]
    in_dtype = x.dtype
    if in_dtype == jnp.bfloat16:
        # bf16-native path: the step is HBM-bound (NOTES_r4 probe: 26.9 GB
        # logical bytes/iter at 65% of the v5e roofline), so keeping the
        # transform chain in bf16 halves the dominant traffic.  MXU bf16
        # matmuls accumulate in f32; each chained transform re-rounds to
        # bf16 (~0.4% relative/stage).  Master params, losses, and the PDE
        # residual stay f32 (train_ns casts only the forward).
        dt = jnp.bfloat16
        hp = None
    else:
        if in_dtype not in (jnp.float32, jnp.float64):
            x = x.astype(jnp.float32)
        dt = x.dtype
        hp = jax.lax.Precision.HIGHEST  # transforms mimic FFT accuracy

    mats = [_dft_mats(spatial[k], half_modes[k], k == order - 1, dt)
            for k in range(order)]

    # ---- forward: contract spatial axis 1 repeatedly; the contracted axis
    # reappears as the trailing mode axis -> (B, C, M1..MN)
    re, im = x, None
    for Cm, Sm in mats:
        if im is None:
            re, im = (jnp.tensordot(re, Cm, axes=[[1], [1]], precision=hp),
                      jnp.tensordot(re, Sm, axes=[[1], [1]], precision=hp))
        else:
            rC = jnp.tensordot(re, Cm, axes=[[1], [1]], precision=hp)
            rS = jnp.tensordot(re, Sm, axes=[[1], [1]], precision=hp)
            iC = jnp.tensordot(im, Cm, axes=[[1], [1]], precision=hp)
            iS = jnp.tensordot(im, Sm, axes=[[1], [1]], precision=hp)
            re, im = rC - iS, rS + iC

    # ---- channel contraction PER CORNER on quadrant slices of the
    # (M1..MN) mode block ([low; high] per full-fft axis), batched over
    # modes (same precision policy as the XLA path's einsum: the backend
    # default).  Contracting per corner instead of padding each corner
    # weight into a stacked dense block keeps the padded/summed tensors at
    # activation size (B*O*modes) rather than weight size (I*O*modes) —
    # the stacked form materialized ~66 MB of zero-padded weights (and
    # their cotangents) per w64 PINO layer per step.
    stacked = [2 * m for m in half_modes[:-1]] + [half_modes[-1]]
    msym = "uvwxyz"[:order]
    eq = f"bi{msym},io{msym}->bo{msym}"
    orr = oii = None
    for w, corner in zip(weights, corner_slices(half_modes)):
        dense = factorized.to_dense(w)  # complex (I, O, h1..hN)
        dwr = dense.real.astype(dt)
        dwi = dense.imag.astype(dt)
        qsl = [slice(None), slice(None)]
        cfg = [(0, 0, 0), (0, 0, 0)]
        for sl, h, M in zip(corner, half_modes, stacked):
            if sl.start is None:           # low block [0:h]
                qsl.append(slice(None, h))
                cfg.append((0, M - h, 0))
            else:                          # high block [h:2h]
                qsl.append(slice(M - h, M))
                cfg.append((M - h, 0, 0))
        qr, qi = re[tuple(qsl)], im[tuple(qsl)]
        br = jnp.einsum(eq, qr, dwr) - jnp.einsum(eq, qi, dwi)
        bi = jnp.einsum(eq, qr, dwi) + jnp.einsum(eq, qi, dwr)
        zero = jnp.zeros((), dt)
        pr = jax.lax.pad(br, zero, cfg)
        pi = jax.lax.pad(bi, zero, cfg)
        orr = pr if orr is None else orr + pr
        oii = pi if oii is None else oii + pi

    # ---- inverse: contract mode axis 2 repeatedly with conj(F)^T; the
    # rfft axis takes the real part with conjugate-pair doubling, and the
    # whole normalization lands as one static scale (matching the
    # rfftn(norm) + irfftn(norm) pair of the FFT path)
    out_sizes = tuple(output_sizes) if output_sizes is not None \
        else tuple(spatial)
    n_in = n_out = 1
    for s, o in zip(spatial, out_sizes):
        n_in *= s
        n_out *= o
    if fft_norm == "backward":
        scale = 1.0 / n_out
    elif fft_norm == "forward":
        scale = 1.0 / n_in
    else:  # ortho
        scale = 1.0 / (n_in * n_out) ** 0.5
    re, im = orr, oii
    for k in range(order):
        last = k == order - 1
        Cm, Sm = _idft_mats(spatial[k], half_modes[k], last,
                            out_sizes[k], dt)
        if last:
            Cm = Cm * scale
            Sm = Sm * scale
        # inverse kernel e^{+i*2pi f n/N} = conj(F) = C - i*S, so
        # (re + i*im)(C - i*S) -> real: re*C + im*S, imag: -re*S + im*C
        rC = jnp.tensordot(re, Cm, axes=[[2], [0]], precision=hp)
        iS = jnp.tensordot(im, Sm, axes=[[2], [0]], precision=hp)
        if last:
            re = rC + iS   # real part only (conjugate symmetry folded in)
            break
        rS = jnp.tensordot(re, Sm, axes=[[2], [0]], precision=hp)
        iC = jnp.tensordot(im, Cm, axes=[[2], [0]], precision=hp)
        re, im = rC + iS, iC - rS

    out = jnp.moveaxis(re, 1, -1)
    if bias is not None:
        out = out + bias
    if out.dtype != in_dtype and in_dtype not in (jnp.float32, jnp.float64):
        out = out.astype(in_dtype)
    return out


def _assemble_corner_weights(weights, half_modes: Sequence[int], dt):
    """Concatenate the 2^(N-1) corner weights into one full stacked-mode
    block, mode axes REVERSED (M_N..M_1) and flattened, as (re, im) pairs
    of shape (I, O, prod(M)).

    The stacked transform of `fused_dft_conv_nd` computes exactly the
    [low; high] frequencies per axis, so the corners tile the whole block —
    assembly is pure concatenation (no zero-fill), in the corner order of
    `corner_slices` (itertools.product, last axis fastest)."""
    order = len(half_modes)
    dense = [factorized.to_dense(w) for w in weights]  # complex (I,O,h1..hN)

    def build(ws, axis):
        if axis == order - 1:  # rfft axis: low modes only
            return ws[0]
        half = len(ws) // 2
        lo = build(ws[:half], axis + 1)
        hi = build(ws[half:], axis + 1)
        return jnp.concatenate([lo, hi], axis=2 + axis)

    full = build(dense, 0)  # (I, O, M1s..MNs)
    perm = (0, 1) + tuple(range(order + 1, 1, -1))
    full = jnp.transpose(full, perm)  # (I, O, MNs..M1s)
    I, O = full.shape[:2]
    full = full.reshape(I, O, -1)
    return full.real.astype(dt), full.imag.astype(dt)


def fused_dft_conv_nd(
    x: jnp.ndarray,
    weights: Sequence[dict],
    half_modes: Sequence[int],
    *,
    fft_norm: str = "backward",
    bias: Optional[jnp.ndarray] = None,
    output_sizes: Optional[Sequence[int]] = None,
) -> jnp.ndarray:
    """Kernel-count-minimized DFT-matmul spectral convolution.

    Same math as `truncated_dft_conv_nd` (reference semantics:
    neuralop/models/spectral_convolution.py:303-347) but engineered for the
    dispatch-bound TPU regime the round-2 MFU analysis identified (~30 us
    per kernel launch; the chained tensordot path emits ~60 kernels per
    layer forward):

    * the rfft axis is contracted FIRST — its transpose is a local
      (s_N, C) tile swap instead of a major-axis move of the full array;
    * re/im ride ONE stacked array (leading axis 2B), so each transform
      axis costs two matmuls + one fused combine instead of four matmuls;
    * the 2^(N-1) corner weights are concatenated into one stacked-mode
      block (pure concat — the kept spectrum is exactly tiled by the
      corners) so the channel contraction is a single batched einsum per
      re/im component instead of 4 einsums x corners + pad + sum;
    * mode axes stay flattened through the middle; the inverse mirrors the
      forward with the normalization folded into the last inverse matrix.

    ~3x fewer kernels per layer than `truncated_dft_conv_nd`; exact to f32
    (same HIGHEST-precision transforms, default-precision contraction).
    """
    order = len(half_modes)
    spatial = x.shape[1:1 + order]
    B = x.shape[0]
    in_dtype = x.dtype
    if in_dtype not in (jnp.float32, jnp.float64):
        x = x.astype(jnp.float32)
    dt = x.dtype
    hp = jax.lax.Precision.HIGHEST

    mats = [_dft_mats(spatial[k], half_modes[k], k == order - 1, dt)
            for k in range(order)]

    # ---- forward: rfft axis first (x is real: two matmuls), then axes
    # N-1..1 on the stacked [re; im] array (two matmuls + combine each).
    sp = "qrstuvwx"[:order]
    eq = f"b{sp}c,z{sp[-1]}->b{sp[:-1]}cz"
    CT, ST = mats[-1]
    re = jnp.einsum(eq, x, CT, precision=hp)
    im = jnp.einsum(eq, x, ST, precision=hp)
    z = jnp.concatenate([re, im], axis=0)  # (2B, s1..s_{N-1}, C, M_N)
    for k in range(order - 2, -1, -1):
        Ck, Sk = mats[k]
        zc = jnp.tensordot(z, Ck, axes=[[k + 1], [1]], precision=hp)
        zs = jnp.tensordot(z, Sk, axes=[[k + 1], [1]], precision=hp)
        # (re + i im) @ (C + i S): re' = re C - im S, im' = re S + im C
        z = jnp.concatenate([zc[:B] - zs[B:], zs[:B] + zc[B:]], axis=0)

    # ---- single channel contraction over the assembled corner block
    # (modes flattened, reversed order M_N..M_1 matching the transform).
    z = z.reshape(2 * B, z.shape[1], -1)  # (2B, C_in, Mflat)
    Wr, Wi = _assemble_corner_weights(weights, half_modes, dt)
    yr = jnp.einsum("bcm,com->bom", z, Wr)
    yi = jnp.einsum("bcm,com->bom", z, Wi)
    z = jnp.concatenate([yr[:B] - yi[B:], yi[:B] + yr[B:]], axis=0)

    # ---- inverse: expand M_1..M_N in turn; inverse kernel is conj(F) =
    # C - i S, so re' = re C + im S, im' = im C - re S; the rfft step keeps
    # the real part only (conjugate doubling + normalization in the mats).
    out_sizes = tuple(output_sizes) if output_sizes is not None \
        else tuple(spatial)
    n_in = n_out = 1
    for s, o in zip(spatial, out_sizes):
        n_in *= s
        n_out *= o
    if fft_norm == "backward":
        scale = 1.0 / n_out
    elif fft_norm == "forward":
        scale = 1.0 / n_in
    else:  # ortho
        scale = 1.0 / (n_in * n_out) ** 0.5

    stacked = [2 * m for m in half_modes[:-1]] + [half_modes[-1]]
    z = z.reshape(2 * B, z.shape[1], *reversed(stacked))
    for j in range(order):
        last = j == order - 1
        Cm, Sm = _idft_mats(spatial[j], half_modes[j], last,
                            out_sizes[j], dt)
        if last:
            Cm = Cm * scale
            Sm = Sm * scale
        # z: (2B, C, M_N..M_{j+1}, s1..s_j) — M_{j+1} is just before the
        # j expanded spatial axes
        ax = z.ndim - 1 - j
        zc = jnp.tensordot(z, Cm, axes=[[ax], [0]], precision=hp)
        zs = jnp.tensordot(z, Sm, axes=[[ax], [0]], precision=hp)
        if last:
            out = zc[:B] + zs[B:]  # real part (conjugate symmetry folded)
            break
        z = jnp.concatenate([zc[:B] + zs[B:], zc[B:] - zs[:B]], axis=0)

    out = jnp.moveaxis(out, 1, -1)
    if bias is not None:
        out = out + bias
    if out.dtype != in_dtype and in_dtype not in (jnp.float32, jnp.float64):
        out = out.astype(in_dtype)
    return out


def slice_weight_modes(params: dict, half_modes: Sequence[int],
                       separable: bool = False) -> dict:
    """Restrict a factorized weight to its first `half_modes` modes per axis
    (the `incremental_n_modes` mechanism,
    reference: spectral_convolution.py:286-301)."""
    order = len(half_modes)
    kind = factorized.factorization_of(params)
    if kind == "dense":
        if "tensor" in params:
            t = params["tensor"]  # (2, I[, O], m1..mN)
            idx = (slice(None),) * (t.ndim - order) + tuple(
                slice(None, m) for m in half_modes)
            return {"tensor": t[idx]}
        key, _ = factorized._dense_mm_key(params)
        t = params[key]  # (2, m1..mN, lead...)
        idx = (slice(None),) + tuple(slice(None, m) for m in half_modes)
        return {key: t[idx]}
    if kind == "tucker":
        factors = list(params["factors"])
        for k, m in enumerate(half_modes):
            f = factors[-order + k]
            factors[-order + k] = f[:, :m, :]
        return {"core": params["core"], "factors": factors}
    if kind == "cp":
        factors = list(params["factors"])
        for k, m in enumerate(half_modes):
            f = factors[-order + k]
            factors[-order + k] = f[:, :m, :]
        return {"lambda": params["lambda"], "factors": factors}
    factors = list(params["factors"])
    for k, m in enumerate(half_modes):
        f = factors[-order + k]
        factors[-order + k] = f[:, :, :m, :]
    return {"factors": factors}


def spectral_conv_nd(
    x: jnp.ndarray,
    weights: Sequence[dict],
    half_modes: Sequence[int],
    *,
    fft_norm: str = "backward",
    separable: bool = False,
    implementation: str = "reconstructed",
    bias: Optional[jnp.ndarray] = None,
    output_sizes: Optional[Sequence[int]] = None,
    backend: str = "auto",
) -> jnp.ndarray:
    """N-D spectral convolution.

    x: (B, d1, ..., dN, C_in) real.
    weights: list of 2^(N-1) factorized weight pytrees (corner order as in
        `corner_slices`).
    half_modes: modes kept per corner per axis (static ints).
    output_sizes: spatial sizes of the output (for up/down-scaling layers);
        defaults to input sizes.
    backend: 'auto' (default) | 'xla' | 'dft' | 'pallas'.  'dft' computes
        the conv as a truncated-DFT matmul sandwich with no FFT (~3x on
        TPU, see truncated_dft_conv_nd); 'auto' picks it when eligible on
        a TPU backend and falls back to the rfftn/irfftn path otherwise;
        'pallas' is the opt-in fused corner-contraction kernel.
    Returns (B, e1, ..., eN, C_out) real.
    """
    order = len(half_modes)
    if backend == "auto":
        # Deployment knob: PDE_SPECTRAL_BACKEND flips every 'auto' call
        # site at once (no code edits for A/B runs).  Applied only when the
        # call is eligible, so mixed-model programs keep working.
        env = os.environ.get("PDE_SPECTRAL_BACKEND", "")
        if env == "xla":
            backend = "xla"
        elif env in ("dft", "dft_fused") and not separable \
                and x.ndim == order + 2:
            backend = env
    if backend != "xla":
        dft_ok = not separable and x.ndim == order + 2
        if backend == "dft" and not dft_ok:
            raise ValueError(
                "backend='dft' requires separable=False and an unbatched "
                "(B, *spatial, C) input")
        if backend == "dft_fused":
            if not dft_ok:
                raise ValueError(
                    "backend='dft_fused' requires separable=False and an "
                    "unbatched (B, *spatial, C) input")
            return fused_dft_conv_nd(
                x, weights, half_modes, fft_norm=fft_norm, bias=bias,
                output_sizes=output_sizes)
        if backend == "dft" or (backend == "auto" and dft_ok
                                and jax.default_backend() == "tpu"):
            # XLA's TPU FFT runs far below the roofline; the truncated-DFT
            # matmul sandwich is ~3x faster on the PINO trunk and exact
            # (see truncated_dft_conv_nd).  CPU keeps the FFT path.
            return truncated_dft_conv_nd(
                x, weights, half_modes, fft_norm=fft_norm, bias=bias,
                output_sizes=output_sizes)
        pallas_ok = (order == 2 and not separable and x.ndim == 4
                     and x.dtype in (jnp.float32, jnp.bfloat16)
                     and len(weights) == 2)
        if backend == "pallas":
            # explicit opt-in: fused corner-contraction kernel (still FFT
            # for the transforms; wins at moderate contraction sizes,
            # ~47 MFLOP -> 4.5x over XLA's per-mode GEMMs; NOTES_r2)
            if not pallas_ok:
                raise ValueError(
                    "backend='pallas' requires a 2-D, non-separable, "
                    "unbatched-rank-4 f32/bf16 spectral conv")
            from .pallas_kernels import spectral_conv_2d_pallas
            return spectral_conv_2d_pallas(
                x, weights, half_modes, fft_norm=fft_norm, bias=bias,
                output_sizes=output_sizes)
    spatial = x.shape[1:1 + order]
    for k, (m, size) in enumerate(zip(half_modes, spatial)):
        limit = size // 2 + 1 if k == order - 1 else size // 2
        if m > limit:
            raise ValueError(
                f"half_modes[{k}]={m} exceeds the available spectrum for "
                f"spatial size {size} (max {limit}); lower n_modes or raise "
                "the resolution")
    fft_axes = tuple(range(1, 1 + order))
    in_dtype = x.dtype
    if in_dtype not in (jnp.float32, jnp.float64):
        # bf16 activations: FFT requires f32/f64 (the reference likewise
        # upcasts, spectral_convolution.py:324); the result is cast back so
        # a bf16 pipeline stays bf16 between layers.
        x = x.astype(jnp.float32)
    x_ft = rfftn(x, axes=fft_axes, norm=fft_norm)

    spectrum_shape = list(x_ft.shape[1:1 + order])
    corners = corner_slices(half_modes)
    out_ft = None
    for w, corner in zip(weights, corners):
        idx = (slice(None),) + corner + (slice(None),)
        block = factorized.contract(
            x_ft[idx], w, separable=separable, implementation=implementation)
        cfg = [(0, 0, 0)] + _pad_config(corner, spectrum_shape) + [(0, 0, 0)]
        padded = jax.lax.pad(block, jnp.zeros((), block.dtype), cfg)
        out_ft = padded if out_ft is None else out_ft + padded

    out_sizes = tuple(output_sizes) if output_sizes is not None else spatial
    out = irfftn(out_ft, s=out_sizes, axes=fft_axes, norm=fft_norm)
    if bias is not None:
        out = out + bias
    if out.dtype != in_dtype and in_dtype not in (jnp.float32, jnp.float64):
        out = out.astype(in_dtype)
    return out


def spectral_conv_1d(x, weight, modes, **kw):
    """1-D special case: keep only low modes (spectral_convolution.py:382)."""
    return spectral_conv_nd(x, [weight], [modes], **kw)


def dft_matmul_reference(x: jnp.ndarray, weights: Sequence[jnp.ndarray],
                         half_modes: Sequence[int], fft_norm: str = "backward"):
    """Slow, obviously-correct oracle used by the tests: materializes the
    dense weights and does the corner writes with `.at[].set` (mirroring the
    reference's indexing semantics) instead of pad+sum."""
    order = len(half_modes)
    fft_axes = tuple(range(1, 1 + order))
    x_ft = rfftn(x, axes=fft_axes, norm=fft_norm)
    out_shape = list(x_ft.shape)
    out_shape[-1] = weights[0].shape[1]
    out_ft = jnp.zeros(out_shape, x_ft.dtype)
    for w, corner in zip(weights, corner_slices(half_modes)):
        idx = (slice(None),) + corner + (slice(None),)
        out_ft = out_ft.at[idx].set(
            factorized.contract_dense(x_ft[idx], w))
    return irfftn(out_ft, s=x.shape[1:1 + order], axes=fft_axes,
                  norm=fft_norm)
