"""Tests for the spectral convolution core, padding, resample, losses."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pde_policylearning_tpu.ops import factorized as fz
from pde_policylearning_tpu.ops import fourier, losses, padding, resample


def _weights(key, n, shape, factorization="dense", rank=0.5):
    keys = jax.random.split(key, n)
    return [fz.init_factorized(k, shape, factorization, rank=rank, std=0.1)
            for k in keys]


@pytest.mark.parametrize("order,half_modes,spatial", [
    (1, (4,), (16,)),
    (2, (4, 3), (12, 10)),
    (3, (3, 2, 2), (8, 8, 6)),
])
def test_pad_assembly_matches_scatter_oracle(order, half_modes, spatial):
    """The pad+sum corner assembly must equal the reference-style scatter."""
    n_w = 2 ** (order - 1)
    in_ch, out_ch = 3, 5
    ws = _weights(jax.random.PRNGKey(0), n_w, (in_ch, out_ch, *half_modes))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, *spatial, in_ch))

    out = fourier.spectral_conv_nd(x, ws, half_modes)
    dense = [fz.to_dense(w) for w in ws]
    ref = fourier.dft_matmul_reference(x, dense, half_modes)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    assert out.shape == (2, *spatial, out_ch)


@pytest.mark.parametrize("order,half_modes,spatial", [
    (1, (4,), (16,)),
    (2, (4, 3), (12, 10)),
    (2, (4, 4), (8, 8)),        # last-axis modes include the Nyquist bin
    (3, (3, 2, 2), (8, 8, 7)),  # odd rfft axis
])
@pytest.mark.parametrize("norm", ["backward", "forward", "ortho"])
@pytest.mark.parametrize("backend", ["dft", "dft_fused"])
def test_dft_backend_matches_fft_path(order, half_modes, spatial, norm,
                                      backend):
    """backend='dft' (truncated-DFT matmul sandwich, the TPU fast path) and
    backend='dft_fused' (kernel-count-minimized variant) must reproduce the
    rfftn/irfftn path exactly."""
    n_w = 2 ** (order - 1)
    ws = _weights(jax.random.PRNGKey(4), n_w, (3, 5, *half_modes))
    x = jax.random.normal(jax.random.PRNGKey(5), (2, *spatial, 3))
    ref = fourier.spectral_conv_nd(x, ws, half_modes, fft_norm=norm)
    out = fourier.spectral_conv_nd(x, ws, half_modes, fft_norm=norm,
                                   backend=backend)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("factorization", ["tucker", "cp"])
@pytest.mark.parametrize("dft_backend", ["dft", "dft_fused"])
def test_dft_backend_factorized_and_grads(factorization, dft_backend):
    half_modes = (3, 3)
    ws = _weights(jax.random.PRNGKey(6), 2, (4, 4, *half_modes),
                  factorization, rank=0.8)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 10, 10, 4))

    def loss(ws, backend):
        out = fourier.spectral_conv_nd(x, ws, half_modes, backend=backend)
        return jnp.mean(out ** 2)

    np.testing.assert_allclose(float(loss(ws, dft_backend)),
                               float(loss(ws, "xla")), rtol=1e-5)
    g_d = jax.grad(lambda w: loss(w, dft_backend))(ws)
    g_x = jax.grad(lambda w: loss(w, "xla"))(ws)
    for a, b in zip(jax.tree.leaves(g_d), jax.tree.leaves(g_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


@pytest.mark.parametrize("out_sizes", [(24, 24), (6, 6), (24, 6), (13, 9)])
@pytest.mark.parametrize("norm", ["backward", "forward"])
@pytest.mark.parametrize("dft_backend", ["dft", "dft_fused"])
def test_dft_backend_output_scaling_matches_fft_path(out_sizes, norm,
                                                     dft_backend):
    """The DFT path must replicate irfftn(s=output_sizes)'s pad/truncate
    semantics exactly for the up/down-scaling layers (UNO)."""
    half_modes = (3, 3)
    ws = _weights(jax.random.PRNGKey(10), 2, (3, 4, *half_modes))
    x = jax.random.normal(jax.random.PRNGKey(11), (2, 12, 12, 3))
    ref = fourier.spectral_conv_nd(x, ws, half_modes, fft_norm=norm,
                                   output_sizes=out_sizes)
    out = fourier.spectral_conv_nd(x, ws, half_modes, fft_norm=norm,
                                   output_sizes=out_sizes,
                                   backend=dft_backend)
    assert out.shape == ref.shape == (2, *out_sizes, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-6)


def test_dft_backend_bias():
    half_modes = (3, 3)
    ws = _weights(jax.random.PRNGKey(8), 2, (3, 3, *half_modes))
    x = jax.random.normal(jax.random.PRNGKey(9), (2, 8, 8, 3))
    bias = jnp.asarray([0.5, -1.0, 2.0])
    ref = fourier.spectral_conv_nd(x, ws, half_modes, bias=bias)
    for be in ("dft", "dft_fused"):
        out = fourier.spectral_conv_nd(x, ws, half_modes, bias=bias,
                                       backend=be)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-6)


def test_dft_backend_bf16_native():
    """bf16 input takes the bf16-native transform path (HBM-bound PINO
    step, NOTES_r4): output is bf16, tracks the f32 path to bf16 rounding,
    and gradients stay finite and close."""
    half_modes = (3, 3)
    ws = _weights(jax.random.PRNGKey(12), 2, (4, 4, *half_modes))
    x = jax.random.normal(jax.random.PRNGKey(13), (2, 12, 12, 4),
                          jnp.float32)
    ref = fourier.spectral_conv_nd(x, ws, half_modes, backend="dft")
    out = fourier.spectral_conv_nd(x.astype(jnp.bfloat16), ws, half_modes,
                                   backend="dft")
    assert out.dtype == jnp.bfloat16
    scale = float(jnp.abs(ref).max())
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               rtol=0, atol=5e-2 * scale)

    def loss(ws):
        o = fourier.spectral_conv_nd(x.astype(jnp.bfloat16), ws, half_modes,
                                     backend="dft")
        return jnp.mean(o.astype(jnp.float32) ** 2)

    def loss32(ws):
        o = fourier.spectral_conv_nd(x, ws, half_modes, backend="dft")
        return jnp.mean(o ** 2)

    g16 = jax.grad(loss)(ws)
    g32 = jax.grad(loss32)(ws)
    for a, b in zip(jax.tree.leaves(g16), jax.tree.leaves(g32)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        assert np.isfinite(a).all()
        denom = np.abs(b).max() + 1e-12
        assert np.abs(a - b).max() / denom < 6e-2


def test_spectral_backend_env_knob(monkeypatch):
    """PDE_SPECTRAL_BACKEND flips 'auto' call sites to the named backend
    when eligible, and leaves ineligible (separable) calls on the default
    path instead of raising."""
    half_modes = (3, 3)
    ws = _weights(jax.random.PRNGKey(8), 2, (3, 3, *half_modes))
    x = jax.random.normal(jax.random.PRNGKey(9), (2, 8, 8, 3))
    calls = []
    real = fourier.fused_dft_conv_nd

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(fourier, "fused_dft_conv_nd", spy)
    monkeypatch.setenv("PDE_SPECTRAL_BACKEND", "dft_fused")
    ref = fourier.spectral_conv_nd(x, ws, half_modes, backend="xla")
    out = fourier.spectral_conv_nd(x, ws, half_modes)
    assert calls, "env knob did not route 'auto' to the fused backend"
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-6)
    # separable call is ineligible: must fall back, not raise
    ws_sep = _weights(jax.random.PRNGKey(8), 2, (3, *half_modes))
    fourier.spectral_conv_nd(x, ws_sep, half_modes, separable=True)


@pytest.mark.parametrize("factorization", ["dense", "tucker", "cp", "tt"])
@pytest.mark.parametrize("implementation", ["reconstructed", "factorized"])
def test_spectral_conv_factorizations(factorization, implementation):
    half_modes = (4, 3)
    ws = _weights(jax.random.PRNGKey(2), 2, (3, 4, *half_modes),
                  factorization, rank=0.8)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 12, 12, 3))
    out = fourier.spectral_conv_nd(x, ws, half_modes,
                                   implementation=implementation)
    assert out.shape == (2, 12, 12, 4)
    assert jnp.all(jnp.isfinite(out))


def test_incremental_modes_slicing():
    full = (6, 4)
    ws = _weights(jax.random.PRNGKey(4), 2, (3, 3, *full), "tucker", rank=0.9)
    small = (3, 2)
    sliced = [fourier.slice_weight_modes(w, small) for w in ws]
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 16, 16, 3))
    out = fourier.spectral_conv_nd(x, sliced, small,
                                   implementation="factorized")
    assert out.shape == (1, 16, 16, 3)
    # dense path too
    wd = _weights(jax.random.PRNGKey(6), 2, (3, 3, *full), "dense")
    sliced_d = [fourier.slice_weight_modes(w, small) for w in wd]
    out_d = fourier.spectral_conv_nd(x, sliced_d, small)
    assert out_d.shape == (1, 16, 16, 3)


def test_output_scaling():
    half_modes = (4, 4)
    ws = _weights(jax.random.PRNGKey(7), 2, (2, 2, *half_modes))
    x = jax.random.normal(jax.random.PRNGKey(8), (1, 16, 16, 2))
    up = fourier.spectral_conv_nd(x, ws, half_modes, output_sizes=(32, 32))
    down = fourier.spectral_conv_nd(x, ws, half_modes, output_sizes=(8, 8))
    assert up.shape == (1, 32, 32, 2)
    assert down.shape == (1, 8, 8, 2)


@pytest.mark.parametrize("mode", ["one-sided", "symmetric"])
def test_pad_unpad_roundtrip(mode):
    """reference: neuralop/models/tests/test_padding.py:6-17."""
    x = jax.random.normal(jax.random.PRNGKey(9), (2, 16, 16, 3))
    padded = padding.pad_domain(x, 0.25, mode)
    extra = int(round(0.25 * 16)) * (2 if mode == "symmetric" else 1)
    assert padded.shape == (2, 16 + extra, 16 + extra, 3)
    unpadded = padding.unpad_domain(padded, 0.25, mode)
    np.testing.assert_allclose(np.asarray(unpadded), np.asarray(x))


def test_resample_shapes():
    """reference: neuralop/models/tests/test_resample.py:4-18."""
    x = jax.random.normal(jax.random.PRNGKey(10), (2, 8, 8, 8, 3))
    up = resample.resample(x, 2.0, [1, 2, 3])
    assert up.shape == (2, 16, 16, 16, 3)
    x2 = jax.random.normal(jax.random.PRNGKey(11), (2, 8, 8, 3))
    up2 = resample.resample(x2, [2.0, 2.0], [1, 2])
    assert up2.shape == (2, 16, 16, 3)


def test_spectral_resample_preserves_bandlimited():
    # A band-limited signal upsampled spectrally then downsampled is exact.
    n = 16
    t = jnp.arange(n) / n
    sig = jnp.sin(2 * jnp.pi * 2 * t)
    x = jnp.broadcast_to(sig[None, :, None, None, None],
                         (1, n, n, n, 1)).astype(jnp.float64)
    up = resample.resample(x, 2.0, [1, 2, 3])
    down = resample.resample(up, 0.5, [1, 2, 3])
    np.testing.assert_allclose(np.asarray(down), np.asarray(x), atol=1e-8)


def test_lploss_values():
    x = jnp.ones((4, 8, 8))
    y = jnp.zeros((4, 8, 8))
    l = losses.LpLoss(d=2, p=2, reductions="mean")
    rel = l.rel(x, x + 1e-9)
    assert float(rel) < 1e-6
    simple = losses.SimpleLpLoss(d=2, p=2)
    assert float(simple.rel(x, x)) == 0.0
    # rel(x, y) with y=0 -> inf; use abs instead
    assert float(simple.abs(x, y)) > 0


def test_h1_loss_runs():
    x = jax.random.normal(jax.random.PRNGKey(12), (4, 16, 16))
    y = x + 0.01 * jax.random.normal(jax.random.PRNGKey(13), (4, 16, 16))
    h1 = losses.H1Loss(d=2, reductions="mean")
    l2 = losses.LpLoss(d=2, reductions="mean")
    assert float(h1(x, y)) >= float(l2(x, y)) * 0.5
    assert jnp.isfinite(h1(x, y))


def test_hs_loss_runs():
    x = jax.random.normal(jax.random.PRNGKey(14), (2, 16, 16))
    y = x + 0.1
    hs = losses.HsLoss(d=2, k=1)
    assert jnp.isfinite(hs(x, y))


def test_normalizers_roundtrip():
    from pde_policylearning_tpu.ops import normalization as nz
    x = 3.0 + 2.0 * jax.random.normal(jax.random.PRNGKey(15), (32, 8, 8))
    for norm in [nz.UnitGaussianNormalizer.fit(x),
                 nz.GaussianNormalizer.fit(x),
                 nz.NormalizerGivenMeanStd(mean=jnp.mean(x), std=jnp.std(x))]:
        enc = norm.encode(x)
        assert abs(float(jnp.mean(enc))) < 0.5
        np.testing.assert_allclose(np.asarray(norm.decode(enc)),
                                   np.asarray(x), rtol=1e-4, atol=1e-5)
