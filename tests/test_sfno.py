"""SHT + spherical FNO tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pde_policylearning_tpu.models.sfno import SFNO, SphericalConv
from pde_policylearning_tpu.ops import sht


def _sph_harm_field(nlat, nlon, l, m, grid="equiangular"):
    """Real part of Y_l^m sampled on the grid."""
    if grid == "equiangular":
        theta = np.pi * (np.arange(nlat) + 0.5) / nlat
    else:
        x, _ = np.polynomial.legendre.leggauss(nlat)
        theta = np.arccos(np.sort(-x) * -1)[::-1]
        theta = np.arccos(np.sort(x)[::-1])
    phi = 2 * np.pi * np.arange(nlon) / nlon
    P = sht._legendre_assoc(l + 1, m + 1, np.cos(theta))[l, m]
    return P[:, None] * np.cos(m * phi)[None, :]


@pytest.mark.parametrize("grid", ["equiangular", "legendre-gauss"])
def test_sht_roundtrip_bandlimited(grid):
    nlat, nlon = 16, 32
    rng = np.random.default_rng(0)
    # band-limited random field: synthesize from random coefficients
    lmax, mmax = nlat // 2, nlat // 2
    flm = (rng.normal(size=(1, lmax, mmax, 1))
           + 1j * rng.normal(size=(1, lmax, mmax, 1)))
    # zero out m > l (invalid coefficients)
    for l in range(lmax):
        flm[:, l, l + 1:, :] = 0
    flm[:, :, 0, :] = flm[:, :, 0, :].real  # m=0 must be real
    f = sht.irsht(jnp.asarray(flm), nlat, nlon, grid=grid)
    flm2 = sht.rsht(f, lmax=lmax, mmax=mmax, grid=grid)
    np.testing.assert_allclose(np.asarray(flm2), flm, rtol=1e-4, atol=1e-6)


def test_sht_picks_out_harmonics():
    nlat, nlon = 24, 48
    f = _sph_harm_field(nlat, nlon, l=3, m=2)[None, :, :, None]
    flm = np.asarray(sht.rsht(jnp.asarray(f), lmax=8, mmax=8))
    mag = np.abs(flm[0, :, :, 0])
    # dominant coefficient at (l=3, m=2)
    assert np.unravel_index(mag.argmax(), mag.shape) == (3, 2)


@pytest.mark.parametrize("contraction", ["dhconv", "full"])
def test_spherical_conv(contraction):
    conv = SphericalConv(3, 5, (6, 6), contraction=contraction)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 24, 3))
    params = conv.init(jax.random.PRNGKey(1), x)["params"]
    out = conv.apply({"params": params}, x)
    assert out.shape == (2, 12, 24, 5)
    assert bool(jnp.isfinite(out).all())


def test_sfno_forward_backward():
    model = SFNO(n_modes=(6, 6), hidden_channels=8, in_channels=2,
                 out_channels=1, n_layers=2, lifting_channels=8,
                 projection_channels=8)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 12, 24, 2))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    out = model.apply({"params": params}, x)
    assert out.shape == (2, 12, 24, 1)

    g = jax.grad(lambda p: jnp.mean(model.apply({"params": p}, x) ** 2))(
        params)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in jax.tree.leaves(g))
