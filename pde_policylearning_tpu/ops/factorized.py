"""Factorized complex tensors as JAX pytrees.

TPU-first replacement for the tensorly-torch ``FactorizedTensor`` weights used
by the reference's factorized spectral convolutions
(reference: neuralop/models/spectral_convolution.py:15-140).

Design notes
------------
* Every parameter leaf is a **real** float array; complex weights are stored
  with a leading axis of size 2 holding (real, imag).  This keeps optimizers,
  checkpointing, and mixed-precision casts trivial — no complex-aware Adam
  needed (the reference ships a custom one: libs/pino_utils/adam.py:54).
* Contractions are expressed as ``jnp.einsum`` so XLA maps the channel
  contraction onto the MXU; mode axes ride along as batch dims.
* ``implementation='reconstructed'`` materializes the dense weight then
  contracts; ``'factorized'`` contracts the input directly with the factors
  (same two paths the reference exposes).
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

_EINSUM_SYMBOLS = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
# Disjoint alphabets for building einsum equations: mode axes are lowercase
# (never 'i'/'o' which name channels, never 'B' which names batch), rank axes
# are uppercase (never 'B').
_MODE_SYMS = "abcdefghjklmn"
_RANK_SYMS = "CDEFGHIJKLMNOPQRSTUVWXYZ"


def as_complex(w: jnp.ndarray) -> jnp.ndarray:
    """(2, ...) real array -> complex array.

    bf16 weights (mixed-precision forward) are upcast: lax.complex accepts
    only f32/f64, and the spectrum they multiply is complex64 anyway."""
    if w.dtype not in (jnp.float32, jnp.float64):
        w = w.astype(jnp.float32)
    return jax.lax.complex(w[0], w[1])


def _normal_pair(key, shape, std, dtype):
    """Init a (2, *shape) real array whose complex view has std `std`.

    Matches torch's complex normal_ exactly (verified by direct sampling:
    normal_(cfloat, 0, s) gives component std s/sqrt(2), |w| rms s —
    the reference spectral convs' init, spectral_convolution.py:223)."""
    # real/imag each get std/sqrt(2) so |w| has the requested std.
    return std / math.sqrt(2.0) * jax.random.normal(key, (2, *shape), dtype=dtype)


# ---------------------------------------------------------------------------
# Rank resolution (tltorch-compatible semantics: float rank = fraction of the
# dense parameter count).
# ---------------------------------------------------------------------------

def tucker_rank(shape: Sequence[int], rank) -> tuple[int, ...]:
    """Resolve a Tucker rank spec. Float `rank` targets that fraction of the
    dense parameter count, matching tltorch's `validate_tucker_rank`."""
    if isinstance(rank, (tuple, list)):
        return tuple(int(r) for r in rank)
    if isinstance(rank, int):
        return tuple(min(rank, s) for s in shape)
    # float: ranks r_i = ceil(fraction^(1/order) * s_i) approximately hits the
    # requested parameter fraction for the core (factors are small).
    frac = float(rank) ** (1.0 / len(shape))
    return tuple(max(1, min(s, int(math.ceil(frac * s)))) for s in shape)


def cp_rank(shape: Sequence[int], rank) -> int:
    if isinstance(rank, int):
        return rank
    dense = int(np.prod(shape))
    per_rank = sum(shape)
    return max(1, int(math.ceil(float(rank) * dense / per_rank)))


def tt_rank(shape: Sequence[int], rank) -> tuple[int, ...]:
    order = len(shape)
    if isinstance(rank, (tuple, list)):
        return tuple(int(r) for r in rank)
    if isinstance(rank, int):
        r = [1] + [rank] * (order - 1) + [1]
        return tuple(r)
    dense = int(np.prod(shape))
    # solve uniform r so that sum_i s_i * r * r ~= frac * dense
    per_r2 = sum(shape)
    r = max(1, int(math.sqrt(float(rank) * dense / per_r2)))
    return tuple([1] + [r] * (order - 1) + [1])


# ---------------------------------------------------------------------------
# Parameter construction.  Params are plain dicts of real arrays (pytrees).
# ---------------------------------------------------------------------------

def init_factorized(key, shape: Sequence[int], factorization: str = "dense",
                    rank=0.5, std: float = 0.02, dtype=jnp.float32,
                    n_lead: int = 2) -> dict:
    """Create the parameter pytree for a factorized complex tensor.

    `shape` is the *dense* complex shape, e.g. (in_ch, out_ch, m1, m2), with
    `n_lead` leading non-mode (channel/layer) axes followed by mode axes.
    Returns a dict with a `kind` marker key-structure:
      dense : {'mmK': (2, modes..., lead...)}  (K = n_lead; see below)
      tucker: {'core': (2, *ranks), 'factors': [(2, s_i, r_i), ...]}
      cp    : {'lambda': (2, R), 'factors': [(2, s_i, R), ...]}
      tt    : {'factors': [(2, r_i, s_i, r_{i+1}), ...]}

    Dense weights are stored **mode-major** — `(2, m1..mN, lead...)` under
    key ``f"mm{n_lead}"`` — NOT in the logical `(2, lead..., m1..mN)` order
    (which remains the `to_dense` output convention).  Rationale (TPU): the
    default HLO layout tiles the two minor-most axes to (8, 128); with small
    trailing mode axes (e.g. 8x8) every stored copy of the leaf — Adam
    moments, grads, remat copies — pads 16x (the PINO pretrain at the
    reference budget overflowed a 16 GB chip on padding alone).  Trailing
    (in_ch, out_ch) axes pad ~2x at typical widths, and match the
    mode-batched matmul layout the channel contraction wants anyway.
    Legacy `{'tensor': (2, *shape)}` leaves (old checkpoints, transplanted
    reference weights) are still understood by every consumer.
    """
    shape = tuple(int(s) for s in shape)
    factorization = (factorization or "dense").lower()
    if factorization.startswith("complex"):
        factorization = factorization[len("complex"):]
    order = len(shape)
    if factorization == "dense":
        n_lead = max(0, min(int(n_lead), order))
        pair = _normal_pair(key, shape, std, dtype)
        if n_lead in (0, order):
            return {"tensor": pair}
        perm = (0, *range(1 + n_lead, 1 + order), *range(1, 1 + n_lead))
        return {f"mm{n_lead}": jnp.transpose(pair, perm)}
    if factorization == "tucker":
        ranks = tucker_rank(shape, rank)
        keys = jax.random.split(key, order + 1)
        # scale so the reconstructed tensor has ~`std` magnitude:
        # t = core ×_i U_i ; each contraction sums r_i terms.
        core_std = std
        factors = []
        for i, (s, r) in enumerate(zip(shape, ranks)):
            f_std = 1.0 / math.sqrt(r)
            factors.append(_normal_pair(keys[i + 1], (s, r), f_std, dtype))
        return {
            "core": _normal_pair(keys[0], ranks, core_std, dtype),
            "factors": factors,
        }
    if factorization == "cp":
        r = cp_rank(shape, rank)
        keys = jax.random.split(key, order + 1)
        lam = _normal_pair(keys[0], (r,), std, dtype)
        factors = [
            _normal_pair(keys[i + 1], (s, r), 1.0 / math.sqrt(r), dtype)
            for i, s in enumerate(shape)
        ]
        return {"lambda": lam, "factors": factors}
    if factorization == "tt":
        ranks = tt_rank(shape, rank)
        keys = jax.random.split(key, order)
        factors = []
        for i, s in enumerate(shape):
            r_in, r_out = ranks[i], ranks[i + 1]
            f_std = std ** (1.0 / order) / math.sqrt(r_in)
            factors.append(_normal_pair(keys[i], (r_in, s, r_out), f_std, dtype))
        return {"factors": factors}
    raise ValueError(f"Unknown factorization: {factorization!r}")


def take_layer(params: dict, index: int) -> dict:
    """For jointly-factorized weights whose dense shape has a leading layer
    axis (reference: joint_factorization, spectral_convolution.py:252-257):
    return the weight pytree of sub-tensor `index`.

    dense: slice the tensor; tucker/cp: slice the first factor's rows and
    keep the rest shared; tt: slice the first factor's middle axis."""
    kind = factorization_of(params)
    if kind == "dense":
        if "tensor" in params:
            return {"tensor": params["tensor"][:, index]}
        key, lead = _dense_mm_key(params)
        # stored (2, modes..., L, lead-1...): the layer axis is the first
        # of the trailing lead axes
        t = jnp.take(params[key], index, axis=params[key].ndim - lead)
        return {f"mm{lead - 1}": t}
    if kind == "tucker":
        f0 = params["factors"][0]
        # contract the selected row of the first factor into the core
        core = as_complex(params["core"])
        row = as_complex(f0)[index]  # (r0,)
        new_core = jnp.tensordot(row, core, axes=[[0], [0]])
        return {"core": jnp.stack([new_core.real, new_core.imag]),
                "factors": list(params["factors"][1:])}
    if kind == "cp":
        f0 = as_complex(params["factors"][0])[index]  # (R,)
        lam = as_complex(params["lambda"]) * f0
        return {"lambda": jnp.stack([lam.real, lam.imag]),
                "factors": list(params["factors"][1:])}
    f0 = as_complex(params["factors"][0])[:, index, :]  # (r0, r1) with r0=1
    f1 = as_complex(params["factors"][1])
    merged = jnp.einsum("ab,bsc->asc", f0, f1)
    return {"factors": [jnp.stack([merged.real, merged.imag])]
            + list(params["factors"][2:])}


def _dense_mm_key(params: dict):
    """(key, n_lead) of a mode-major dense leaf, or (None, None)."""
    for k in params:
        if k.startswith("mm"):
            return k, int(k[2:])
    return None, None


def factorization_of(params: dict) -> str:
    if "tensor" in params or _dense_mm_key(params)[0] is not None:
        return "dense"
    if "core" in params:
        return "tucker"
    if "lambda" in params:
        return "cp"
    return "tt"


def to_dense(params: dict) -> jnp.ndarray:
    """Materialize the full complex tensor from its factors.

    Output is always in the logical `(lead..., m1..mN)` axis order; the
    mode-major storage transpose is undone here (it folds into the
    consuming einsum's dimension numbers — no extra materialization)."""
    kind = factorization_of(params)
    if kind == "dense":
        if "tensor" in params:
            return as_complex(params["tensor"])
        key, lead = _dense_mm_key(params)
        w = as_complex(params[key])  # (modes..., lead...)
        return jnp.moveaxis(w, range(w.ndim - lead, w.ndim), range(lead))
    if kind == "tucker":
        core = as_complex(params["core"])
        factors = [as_complex(f) for f in params["factors"]]
        order = core.ndim
        core_syms = _EINSUM_SYMBOLS[:order]
        out_syms = _EINSUM_SYMBOLS[order:2 * order]
        operands = ",".join(o + c for o, c in zip(out_syms, core_syms))
        eq = f"{core_syms},{operands}->{out_syms}"
        return jnp.einsum(eq, core, *factors)
    if kind == "cp":
        lam = as_complex(params["lambda"])
        factors = [as_complex(f) for f in params["factors"]]
        order = len(factors)
        r = "Z"
        out_syms = _EINSUM_SYMBOLS[:order]
        operands = ",".join(s + r for s in out_syms)
        eq = f"{r},{operands}->{out_syms}"
        return jnp.einsum(eq, lam, *factors)
    # tt
    factors = [as_complex(f) for f in params["factors"]]
    out = factors[0]  # (1, s0, r1)
    for f in factors[1:]:
        out = jnp.tensordot(out, f, axes=[[-1], [0]])
    return out.squeeze(0).squeeze(-1)


def n_dense_params(shape: Sequence[int]) -> int:
    return 2 * int(np.prod(shape))


def n_params(params: dict) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


# ---------------------------------------------------------------------------
# Direct factorized contractions with channels-last spectral input.
#
# x_ft: (batch, m1, ..., mN, in_ch) complex
# dense weight layout: (in_ch, out_ch, m1, ..., mN)  [separable: (in_ch, m..)]
# output: (batch, m1, ..., mN, out_ch)
# (reference equivalents: _contract_dense/_contract_tucker/_contract_cp/
#  _contract_tt at neuralop/models/spectral_convolution.py:15-100, but
#  re-derived for channels-last layout so the channel contraction is the
#  innermost matmul on the MXU.)
# ---------------------------------------------------------------------------

def contract_dense(x_ft: jnp.ndarray, weight: jnp.ndarray,
                   separable: bool = False) -> jnp.ndarray:
    order = x_ft.ndim - 2  # spatial mode dims
    modes = _MODE_SYMS[:order]
    if separable:
        # weight: (in_ch, *modes); out = x * w (per-channel scaling)
        eq = f"B{modes}i,i{modes}->B{modes}i"
        return jnp.einsum(eq, x_ft, weight)
    eq = f"B{modes}i,io{modes}->B{modes}o"
    return jnp.einsum(eq, x_ft, weight)


def contract_tucker(x_ft: jnp.ndarray, params: dict,
                    separable: bool = False) -> jnp.ndarray:
    core = as_complex(params["core"])
    factors = [as_complex(f) for f in params["factors"]]
    order = x_ft.ndim - 2
    modes = _MODE_SYMS[:order]
    ranks = _RANK_SYMS[:order + 2]
    if separable:
        # core: (r_i, r_m1..r_mN); factors: (I, r_i), (m_k, r_mk)
        core_syms = ranks[:order + 1]
        f_syms = ["i" + core_syms[0]] + [m + r for m, r in zip(modes, core_syms[1:])]
        eq = f"B{modes}i,{core_syms},{','.join(f_syms)}->B{modes}i"
        return jnp.einsum(eq, x_ft, core, *factors)
    core_syms = ranks[:order + 2]
    f_syms = ["i" + core_syms[0], "o" + core_syms[1]] + [
        m + r for m, r in zip(modes, core_syms[2:])
    ]
    eq = f"B{modes}i,{core_syms},{','.join(f_syms)}->B{modes}o"
    return jnp.einsum(eq, x_ft, core, *factors)


def contract_cp(x_ft: jnp.ndarray, params: dict,
                separable: bool = False) -> jnp.ndarray:
    lam = as_complex(params["lambda"])
    factors = [as_complex(f) for f in params["factors"]]
    order = x_ft.ndim - 2
    modes = _MODE_SYMS[:order]
    r = "Z"
    if separable:
        f_syms = ["i" + r] + [m + r for m in modes]
        eq = f"B{modes}i,{r},{','.join(f_syms)}->B{modes}i"
        return jnp.einsum(eq, x_ft, lam, *factors)
    f_syms = ["i" + r, "o" + r] + [m + r for m in modes]
    eq = f"B{modes}i,{r},{','.join(f_syms)}->B{modes}o"
    return jnp.einsum(eq, x_ft, lam, *factors)


def contract_tt(x_ft: jnp.ndarray, params: dict,
                separable: bool = False) -> jnp.ndarray:
    factors = [as_complex(f) for f in params["factors"]]
    order = x_ft.ndim - 2
    modes = _MODE_SYMS[:order]
    dims = ("i" + modes) if separable else ("i" + "o" + modes)
    ranks = _RANK_SYMS[:len(dims) + 1]
    f_syms = [ranks[k] + d + ranks[k + 1] for k, d in enumerate(dims)]
    out_ch = "i" if separable else "o"
    eq = f"B{modes}i,{','.join(f_syms)}->B{modes}{out_ch}"
    return jnp.einsum(eq, x_ft, *factors)


def contract(x_ft: jnp.ndarray, params: dict, separable: bool = False,
             implementation: str = "reconstructed") -> jnp.ndarray:
    """Dispatch to the right contraction for this weight pytree.

    reference: get_contract_fun, neuralop/models/spectral_convolution.py:103.
    """
    kind = factorization_of(params)
    if implementation == "reconstructed" or kind == "dense":
        w = to_dense(params)
        if separable and w.ndim == x_ft.ndim - 1:
            pass
        return contract_dense(x_ft, w, separable=separable)
    if kind == "tucker":
        return contract_tucker(x_ft, params, separable=separable)
    if kind == "cp":
        return contract_cp(x_ft, params, separable=separable)
    return contract_tt(x_ft, params, separable=separable)
