"""Library datasets + utils tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pde_policylearning_tpu import utils
from pde_policylearning_tpu.data import (PositionalEmbedding2D, RandomMGPatch,
                                         TensorDataset,
                                         append_2d_grid_positional_encoding,
                                         load_burgers, load_darcy_flow,
                                         load_navier_stokes,
                                         load_spherical_swe)


def test_positional_encoding():
    x = jnp.ones((2, 8, 8, 1))
    out = append_2d_grid_positional_encoding(x)
    assert out.shape == (2, 8, 8, 3)
    np.testing.assert_allclose(np.asarray(out[0, :, 0, 1]),
                               np.linspace(0, 1, 9)[:-1])


def test_random_mg_patch():
    t = RandomMGPatch(levels=2, seed=0)
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 16, 1))
    y = jax.random.normal(jax.random.PRNGKey(1), (16, 16, 1))
    px, py = t((x, y))
    assert px.shape == (4, 4, 3)  # levels+1 channels, 16/step grid
    assert py.shape == (4, 4, 1)


def test_darcy_generation_and_residual():
    train, test = load_darcy_flow(n_train=4, n_test=2, resolution=24)
    a, u = train.arrays()
    assert a.shape == (4, 24, 24, 1)
    # the generated solution should roughly satisfy -div(a grad u) = 1
    from pde_policylearning_tpu.ops.pde_losses import fdm_darcy
    res = fdm_darcy(u[..., 0], a[..., 0])
    interior_err = float(jnp.mean(jnp.abs(res - 1.0)))
    assert interior_err < 0.5


def test_ns_and_burgers_loaders():
    train, test = load_navier_stokes(n_train=3, n_test=1, resolution=16,
                                     nt=4)
    x, y = train.arrays()
    assert x.shape == (3, 16, 16, 1) and y.shape == (3, 16, 16, 1)
    train_b, _ = load_burgers(n_train=3, n_test=1, resolution=32)
    x0, xT = train_b.arrays()
    assert x0.shape == (3, 32, 1)
    assert bool(jnp.isfinite(xT).all())


def test_spherical_swe_loader():
    train, test = load_spherical_swe(n_train=2, n_test=1, nlat=16, nlon=32)
    x, y = train.arrays()
    assert x.shape == (2, 16, 32, 1)
    assert bool(jnp.isfinite(y).all())


def test_count_params_and_timer():
    tree = {"a": jnp.ones((3, 4)), "b": jnp.ones((5,))}
    assert utils.count_params(tree) == 17
    res = {}
    with utils.timer("t", verbose=False, results=res):
        _ = 1 + 1
    assert res["t"] >= 0


def test_spectrum2_parseval():
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 16))
    spec = utils.spectrum2(x)
    # Parseval: sum of shell energies == 0.5 mean(|u|^2) (fft normalized)
    total = float(jnp.sum(spec))
    expected = 0.5 * float(jnp.mean(x ** 2))
    np.testing.assert_allclose(total, expected, rtol=1e-5)


def test_benchmark_and_flops():
    f = jax.jit(lambda x: x @ x)
    x = jnp.ones((64, 64))
    stats = utils.benchmark(f, x, warmup=1, iters=3)
    assert stats["mean_ms"] > 0
    flops = utils.flop_estimate(lambda x: x @ x, x)
    if flops is not None:
        assert flops >= 2 * 64 ** 3 * 0.9


def test_visualization_facade():
    img = utils.matrix2image(np.random.rand(8, 8))
    assert img.shape == (8, 8, 3) and img.dtype == np.uint8
    panels = utils.vis_diagram({"x": np.random.rand(1, 8, 8),
                                "pred": np.random.rand(1, 8, 8)})
    assert "x" in panels and "pred" in panels
