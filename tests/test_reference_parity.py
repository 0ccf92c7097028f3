"""Numerical parity against the ACTUAL reference implementation.

Builds the reference torch models on CPU (from /root/reference), copies
their weights into the flax twins, and asserts forward agreement — the
BASELINE.md:26 "rel-L2 within 1e-3 of reference" north star, checked 4-6
orders of magnitude tighter on the forward passes.  Pure-f64 models agree
to <=1e-10 rel-L2; models whose reference forward hard-codes f32 pieces
(FNO's `x.float()`, PINO's cfloat buffers) agree at f32 precision
(<=1e-4/1e-5), which is the reference's own numerical floor.

The reference's heavy optional deps (tensorly/tltorch for factorized
weights, torch_harmonics for SHT) are not in this image; `_install_shims`
injects minimal dense-only stand-ins so the reference modules import.
The shims implement only what the dense-parametrized reference forward
actually calls (einsum + a complex parameter holder) — no tensor
factorization, which these tests don't exercise.

Covered (reference file:line):
- SpectralConv2d             neuralop/models/rno.py:34
- RNO2d (full model)         neuralop/models/rno.py:293
- FNO2d via FNO2dObserver    neuralop/models/tfno.py:342, libs/models/fno_models.py:16
- PINObserver2d              libs/models/pino_models/pinobserver.py:129
"""
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

REF = "/root/reference"


def _install_shims():
    import torch.nn as nn

    if "tensorly" not in sys.modules:
        tl = types.ModuleType("tensorly")
        tl.set_backend = lambda *a, **k: None
        tl.ndim = lambda x: x.ndim
        tl.einsum = torch.einsum
        plugins = types.ModuleType("tensorly.plugins")
        plugins.use_opt_einsum = lambda *a, **k: None
        tl.plugins = plugins
        sys.modules["tensorly"] = tl
        sys.modules["tensorly.plugins"] = plugins

    if "tltorch" not in sys.modules:
        class FactorizedTensor(nn.Module):
            """Dense-only stand-in for tltorch's factorized tensor."""
            name = "ComplexDense"

            def __init__(self, shape):
                super().__init__()
                self.tensor = nn.Parameter(
                    torch.zeros(shape, dtype=torch.cfloat))

            @classmethod
            def new(cls, shape, rank=None, factorization="ComplexDense",
                    fixed_rank_modes=None, **kw):
                if "dense" not in str(factorization).lower():
                    raise NotImplementedError(
                        "test shim supports dense factorization only")
                return cls(shape)

            def normal_(self, mean=0.0, std=1.0):
                with torch.no_grad():
                    self.tensor.real.normal_(mean, std)
                    self.tensor.imag.normal_(mean, std)
                return self

            def to_tensor(self):
                return self.tensor

            def __getitem__(self, idx):
                return self.tensor[idx]

        tlt = types.ModuleType("tltorch")
        tlt.FactorizedTensor = FactorizedTensor
        tlt.TensorizedTensor = FactorizedTensor  # imported, unused here
        fts = types.ModuleType("tltorch.factorized_tensors")
        core = types.ModuleType("tltorch.factorized_tensors.core")
        core.FactorizedTensor = FactorizedTensor
        utils = types.ModuleType("tltorch.utils")
        utils.get_tensorized_shape = lambda *a, **k: None
        tlt.factorized_tensors = fts
        tlt.utils = utils
        sys.modules["tltorch"] = tlt
        sys.modules["tltorch.factorized_tensors"] = fts
        sys.modules["tltorch.factorized_tensors.core"] = core
        sys.modules["tltorch.utils"] = utils

    class _Permissive(types.ModuleType):
        """Attribute-permissive stub for import-time-only dependencies."""
        def __getattr__(self, item):
            if item == "__path__":
                return []
            if item.startswith("__") and item.endswith("__"):
                # dunders must behave like a real module's (inspect walks
                # sys.modules and chokes on a non-str __file__ during
                # torch._dynamo's lazy import)
                raise AttributeError(item)
            return object

    # logging/storage/vision deps pulled in at import time by
    # neuralop.utils / datasets / libs model zoos; none are exercised by
    # the dense forward passes under test
    for name in ("wandb", "zarr", "torchvision", "torchvision.transforms"):
        if name not in sys.modules:
            sys.modules[name] = _Permissive(name)

    if "torch_harmonics" not in sys.modules:
        th = types.ModuleType("torch_harmonics")
        th.__path__ = []  # mark as package (examples submodule imported)
        th.RealSHT = object
        th.InverseRealSHT = object
        ex = types.ModuleType("torch_harmonics.examples")
        ex.ShallowWaterSolver = object
        th.examples = ex
        sys.modules["torch_harmonics"] = th
        sys.modules["torch_harmonics.examples"] = ex

    if REF not in sys.path:
        sys.path.insert(0, REF)


@pytest.fixture(scope="module")
def ref():
    """Imported reference modules (skip the whole file if unavailable)."""
    _install_shims()
    try:
        from neuralop.models import rno as ref_rno           # noqa
        from neuralop.models.tfno import FNO2d               # noqa
        from libs.models.pino_models import pinobserver      # noqa
        from libs.models import transformer_models           # noqa
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference not importable: {e}")
    return types.SimpleNamespace(rno=ref_rno, FNO2d=FNO2d,
                                 pinobserver=pinobserver,
                                 transformer=transformer_models)


class _torch_f64:
    """Run reference forwards with f64 default dtype: several reference
    modules create intermediates without an explicit dtype (e.g. the RNO
    hidden-state zeros, rno.py:279), which otherwise come out f32 and
    poison a double-precision comparison.  Explicit `.float()` casts in
    the reference (FactorizedSpectralConv, spectral_convolution.py:324;
    the cfloat buffers of SpectralConv3d, basics.py:120) still run at f32
    — tolerances on those models are f32-level by the reference's own
    construction."""

    def __enter__(self):
        self.prev = torch.get_default_dtype()
        torch.set_default_dtype(torch.float64)
        return self

    def __exit__(self, *exc):
        torch.set_default_dtype(self.prev)
        return False


def t2n(t):
    return np.asarray(t.detach().cpu().numpy())


def rel_l2(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-30))


def _mm2(stacked):
    """(2, I, O, m...) real-stacked -> the mode-major storage dict
    (ops/factorized.py:init_factorized: {'mm2': (2, m..., I, O)})."""
    a = np.asarray(stacked)
    perm = (0, *range(3, a.ndim), 1, 2)
    return {"mm2": jnp.asarray(a.transpose(perm))}


def dense_w(t):
    """torch complex (I, O, m...) -> flax real-stacked mode-major dict."""
    c = t2n(t)
    return _mm2(np.stack([c.real, c.imag], 0))


def lin_w(mod):
    """nn.Linear -> flax Dense params."""
    p = {"kernel": jnp.asarray(t2n(mod.weight).T)}
    if mod.bias is not None:
        p["bias"] = jnp.asarray(t2n(mod.bias))
    return p


def conv1x1_w(mod):
    """nn.Conv1d/2d/3d with kernel_size 1 -> flax Dense params."""
    w = t2n(mod.weight)
    w = w.reshape(w.shape[0], w.shape[1])
    p = {"kernel": jnp.asarray(w.T)}
    if mod.bias is not None:
        p["bias"] = jnp.asarray(t2n(mod.bias))
    return p


# ---------------------------------------------------------------------------
# SpectralConv2d (rno.py:34)
# ---------------------------------------------------------------------------

def test_rno_spectral_conv2d_parity(ref):
    from pde_policylearning_tpu.models.rno import RNOSpectralConv2d
    torch.manual_seed(0)
    C_in, C_out, m1, m2, n = 3, 5, 4, 4, 16
    tmod = ref.rno.SpectralConv2d(C_in, C_out, m1, m2).double().eval()

    # torch fourier_weight[i]: (I, O, m1, m2, 2) real-last
    def stack2(t):
        w = t2n(t)
        return _mm2(np.moveaxis(w, -1, 0))

    params = {"w0": stack2(tmod.fourier_weight[0]),
              "w1": stack2(tmod.fourier_weight[1])}

    x = np.random.RandomState(1).randn(2, n, n, C_in)
    with torch.no_grad(), _torch_f64():
        # torch layout (B, C, H, W)
        ty = tmod(torch.tensor(np.moveaxis(x, -1, 1)))
    jmod = RNOSpectralConv2d(C_in, C_out, m1, m2)
    jy = jmod.apply({"params": params}, jnp.asarray(x))
    assert rel_l2(np.moveaxis(np.asarray(jy), -1, 1), t2n(ty)) < 1e-10


# ---------------------------------------------------------------------------
# RNO2d (rno.py:293)
# ---------------------------------------------------------------------------

def _fourier_layer_params(tmod):
    """reference FourierLayer2d -> flax FourierLayer2d params."""
    return {
        "spec_conv": {
            "w0": _mm2(np.moveaxis(
                t2n(tmod.spec_conv.fourier_weight[0]), -1, 0)),
            "w1": _mm2(np.moveaxis(
                t2n(tmod.spec_conv.fourier_weight[1]), -1, 0)),
        },
        "pointwise": conv1x1_w(tmod.norm_conv1d),
    }


def _rno_cell_params(tcell):
    p = {f"f{i}": _fourier_layer_params(getattr(tcell, f"f{i}"))
         for i in range(1, 9)}
    for i in range(1, 5):
        p[f"b{i}"] = jnp.asarray(t2n(getattr(tcell, f"b{i}")))
    return p


def _spectral_conv_with_fc_params(tmod):
    return {
        "linear": lin_w(tmod.linear),
        "spec_conv": {
            "w0": _mm2(np.moveaxis(
                t2n(tmod.spec_conv.fourier_weight[0]), -1, 0)),
            "w1": _mm2(np.moveaxis(
                t2n(tmod.spec_conv.fourier_weight[1]), -1, 0)),
        },
    }


def test_rno2d_parity(ref):
    from pde_policylearning_tpu.models.rno import RNO2d
    torch.manual_seed(1)
    m1, m2, width, layer_num, n, T = 3, 3, 8, 2, 12, 3
    tmod = ref.rno.RNO2d(m1, m2, width, recurrent_index=0,
                         layer_num=layer_num).double().eval()

    params = {"input_projection": lin_w(tmod.input_projection_layer)}
    for i, tlayer in enumerate(tmod.layers):
        params[f"layer{i}"] = {
            "bias_h": jnp.asarray(t2n(tlayer.bias_h)),
            "scan": {"cell": _rno_cell_params(tlayer.cell)},
        }
    treg = tmod.regressor
    params["regressor"] = {
        "spec0": _spectral_conv_with_fc_params(treg.spectral_conv[0]),
        "spec1": _spectral_conv_with_fc_params(treg.spectral_conv[1]),
        "reg0": lin_w(treg.regressor[0]),
        "reg1": lin_w(treg.regressor[2]),
    }

    x = np.random.RandomState(2).randn(2, T, n, n, 1)
    with torch.no_grad(), _torch_f64():
        ty = tmod(torch.tensor(x))  # reference rolls x.shape[1] steps
    jmod = RNO2d(m1, m2, width, recurrent_index=0, layer_num=layer_num)
    jy = jmod.apply({"params": params}, jnp.asarray(x))
    assert rel_l2(np.asarray(jy), t2n(ty)) < 1e-10


# ---------------------------------------------------------------------------
# FNO2d (tfno.py:342) via the observer wrapper (fno_models.py:16)
# ---------------------------------------------------------------------------

def _fno2d_params(tfno, n_layers):
    """reference FNO2d -> flax FNO param tree (dense weights)."""
    convs = {"bias": jnp.asarray(
        t2n(tfno.fno_blocks.convs.bias)[:, :, 0, 0])}
    for i in range(2 * n_layers):
        convs[f"w{i}"] = dense_w(
            tfno.fno_blocks.convs.weight[i].to_tensor())
    blocks = {"convs": convs}
    for i in range(n_layers):
        skip = tfno.fno_blocks.fno_skips[i]
        w = t2n(skip.weight)[:, :, 0, 0]
        blocks[f"fno_skip{i}"] = {"conv": {"kernel": jnp.asarray(w.T)}}
    return {
        "lifting": {"fc": conv1x1_w(tfno.lifting.fc)},
        "fno_blocks": blocks,
        "projection": {"fc1": conv1x1_w(tfno.projection.fc1),
                       "fc2": conv1x1_w(tfno.projection.fc2)},
    }


def test_fno2d_parity(ref):
    """FNO2d at n_layers=3, where the reference's post-activation
    precedence quirk (fno_block.py:152) coincides with the intended rule —
    both implementations' defaults agree."""
    from pde_policylearning_tpu.models.fno import FNO
    torch.manual_seed(2)
    modes, width, n_layers, n = 8, 8, 3, 16
    tmod = ref.FNO2d(modes, modes, width, in_channels=3, out_channels=1,
                     n_layers=n_layers).double().eval()
    params = _fno2d_params(tmod, n_layers)
    x = np.random.RandomState(3).randn(2, n, n, 3)
    with torch.no_grad(), _torch_f64():
        ty = tmod(torch.tensor(np.moveaxis(x, -1, 1)))
    jmod = FNO(n_modes=(modes, modes), hidden_channels=width, in_channels=3,
               out_channels=1, n_layers=n_layers)
    jy = jmod.apply({"params": params}, jnp.asarray(x))
    # f32 tolerance: the reference conv casts x.float() internally
    assert rel_l2(np.moveaxis(np.asarray(jy), -1, 1), t2n(ty)) < 1e-4


def test_fno2d_parity_quirk_layers4(ref):
    """At the default n_layers=4 the reference skips the activation after
    layer 2 (precedence quirk); `reference_act_quirk=True` reproduces it
    so transplanted reference checkpoints are bit-compatible."""
    from pde_policylearning_tpu.models.fno import FNO
    torch.manual_seed(3)
    modes, width, n_layers, n = 6, 6, 4, 12
    tmod = ref.FNO2d(modes, modes, width, in_channels=3, out_channels=1,
                     n_layers=n_layers).double().eval()
    params = _fno2d_params(tmod, n_layers)
    x = np.random.RandomState(4).randn(2, n, n, 3)
    with torch.no_grad(), _torch_f64():
        ty = tmod(torch.tensor(np.moveaxis(x, -1, 1)))
    jq = FNO(n_modes=(modes, modes), hidden_channels=width, in_channels=3,
             out_channels=1, n_layers=n_layers, reference_act_quirk=True)
    jy = jq.apply({"params": params}, jnp.asarray(x))
    assert rel_l2(np.moveaxis(np.asarray(jy), -1, 1), t2n(ty)) < 1e-4
    # and the fixed rule intentionally differs at n_layers=4
    jfixed = FNO(n_modes=(modes, modes), hidden_channels=width,
                 in_channels=3, out_channels=1, n_layers=n_layers)
    jy2 = jfixed.apply({"params": params}, jnp.asarray(x))
    assert rel_l2(np.asarray(jy2), np.asarray(jy)) > 1e-6


# ---------------------------------------------------------------------------
# PINObserver2d (pinobserver.py:129)
# ---------------------------------------------------------------------------

def _mnet_params(tmod):
    return {"A": jnp.asarray(t2n(tmod.A)), "B": jnp.asarray(t2n(tmod.B)),
            "bias": jnp.asarray(t2n(tmod.bias))}


def test_pinobserver2d_parity(ref):
    from pde_policylearning_tpu.models.pino import PINObserver2d
    torch.manual_seed(4)
    layers = [8, 8, 8]
    modes1, modes2, modes3 = [3, 3], [3, 3], [2, 2]
    S, T = 8, 6
    tmod = ref.pinobserver.PINObserver2d(
        modes1, modes2, modes3, fc_dim=16, layers=layers,
        in_dim=4).double().eval()

    trunk = {}
    for i, (sp, w) in enumerate(zip(tmod.sp_convs, tmod.ws)):
        # reference corner order: w1=(lo,lo), w2=(hi,lo), w3=(lo,hi),
        # w4=(hi,hi); ours enumerates (lo,lo),(lo,hi),(hi,lo),(hi,hi)
        trunk[f"sp{i}"] = {
            "w0": dense_w(sp.weights1), "w1": dense_w(sp.weights3),
            "w2": dense_w(sp.weights2), "w3": dense_w(sp.weights4)}
        trunk[f"w{i}"] = conv1x1_w(w)
    params = {
        "fc0": lin_w(tmod.fc0),
        "mnet1": _mnet_params(tmod.multiplicative_net1),
        "trunk": trunk,
        "mnet2": _mnet_params(tmod.multiplicative_net2),
        "fc1": lin_w(tmod.fc1),
        "fc2": lin_w(tmod.fc2),
    }

    rng = np.random.RandomState(5)
    x = rng.randn(2, S, S, T, 4)
    re = rng.uniform(100, 500, (2,))
    with torch.no_grad(), _torch_f64():
        ty = tmod(torch.tensor(x), torch.tensor(re))
    jmod = PINObserver2d(modes1=modes1, modes2=modes2, modes3=modes3,
                         layers=layers, fc_dim=16, in_dim=4)
    jy = jmod.apply({"params": params}, jnp.asarray(x), jnp.asarray(re))
    # f32 tolerance: SpectralConv3d's out_ft buffer is hard-coded cfloat
    assert rel_l2(np.asarray(jy), t2n(ty)) < 1e-5


# ---------------------------------------------------------------------------
# SimpleTransformerEncoderLayer (transformer_models.py:30)
# ---------------------------------------------------------------------------

def _encoder_layer_params(tmod):
    """reference SimpleTransformerEncoderLayer -> flax params (n_head=1:
    the reference's SpectralConv1d projections are sized d_k=d_model and
    only type-check single-head)."""
    def proj(sc):
        w = t2n(sc.fourier_weight)  # (I, O, modes, 2)
        return {"linear": lin_w(sc.linear),
                "w": _mm2(np.moveaxis(w, -1, 0))}

    def ln(tln):
        return {"scale": jnp.asarray(t2n(tln.weight)),
                "bias": jnp.asarray(t2n(tln.bias))}

    return {
        "attn": {"proj_q": proj(tmod.attn.spectral_conv[0]),
                 "proj_k": proj(tmod.attn.spectral_conv[1]),
                 "proj_v": proj(tmod.attn.spectral_conv[2])},
        "layer_norm1": ln(tmod.layer_norm1),
        "layer_norm2": ln(tmod.layer_norm2),
        "ff": {"lr1": lin_w(tmod.ff.lr1), "lr2": lin_w(tmod.ff.lr2)},
    }


class _no_functional_dropout:
    """The reference attention applies `F.dropout(p_attn)` with functional
    defaults p=0.5, training=True (attention_layers.py:652,681) whenever a
    dropout module is passed — so its eval-mode forward is stochastic (a
    reference bug; verified: two eval calls differ by ~0.2).  Neutralize
    the functional to compare the intended deterministic math."""

    def __enter__(self):
        import torch.nn.functional as F
        self.orig = F.dropout
        F.dropout = lambda x, *a, **k: x
        return self

    def __exit__(self, *exc):
        import torch.nn.functional as F
        F.dropout = self.orig
        return False


@pytest.mark.parametrize("attention_type", ["fourier", "galerkin"])
def test_transformer_encoder_layer_parity(ref, attention_type):
    from pde_policylearning_tpu.models.transformer import (
        SimpleTransformerEncoderLayer)
    torch.manual_seed(5)
    d_model, N = 24, 64
    with _torch_f64():
        tmod = ref.transformer.SimpleTransformerEncoderLayer(
            d_model=d_model, n_head=1, dim_feedforward=48,
            attention_type=attention_type, layer_norm=True,
            dropout=0.0).double().eval()
    params = _encoder_layer_params(tmod)
    x = np.random.RandomState(6).randn(2, N, d_model)
    with torch.no_grad(), _torch_f64(), _no_functional_dropout():
        ty = tmod(torch.tensor(x))
    jmod = SimpleTransformerEncoderLayer(
        d_model=d_model, n_head=1, dim_feedforward=48,
        attention_type=attention_type, layer_norm=True, dropout=0.0)
    jy, _ = jmod.apply({"params": params}, jnp.asarray(x))
    assert rel_l2(np.asarray(jy), t2n(ty)) < 1e-10


def test_torch_reinit_matches_torch_init_distribution(ref):
    """training.torch_reinit must reproduce torch's default Linear/Conv
    init: kernels/biases bounded by sqrt(1/fan_in) with uniform moments,
    spectral weights untouched, deterministic in the rng."""
    import torch

    from pde_policylearning_tpu import models
    from pde_policylearning_tpu.training import torch_reinit

    m = models.FNO2dObserver(modes1=12, modes2=12, width=32)
    p0 = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))["params"]
    p1 = torch_reinit(p0, jax.random.PRNGKey(7))
    p2 = torch_reinit(p0, jax.random.PRNGKey(7))

    fno = p1["fno2d"]
    # projection fc1: fan_in = 32 -> bound sqrt(1/32); compare moments to
    # an actual torch Linear draw
    k = np.asarray(fno["projection"]["fc1"]["kernel"])
    bound = 32 ** -0.5
    assert np.abs(k).max() <= bound
    tl = torch.nn.Linear(32, 256)
    t_std = float(tl.weight.detach().std())
    assert abs(k.std() - t_std) / t_std < 0.1
    b = np.asarray(fno["projection"]["fc1"]["bias"])
    assert np.abs(b).max() <= bound and np.abs(b).max() > 0

    # spectral weights untouched
    np.testing.assert_array_equal(
        np.asarray(fno["fno_blocks"]["convs"]["w0"]["mm2"]),
        np.asarray(p0["fno2d"]["fno_blocks"]["convs"]["w0"]["mm2"]))
    # per-layer spectral-conv bias: init_std*randn with init_std=1/(in*out)
    # (spectral_convolution.py:272) — near-zero scale, nonzero draw
    cb = np.asarray(fno["fno_blocks"]["convs"]["bias"])
    assert 0 < np.abs(cb).max() < 6.0 / 32 ** 2

    # deterministic
    for a, c in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
