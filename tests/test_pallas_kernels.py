"""Pallas kernel correctness tests (interpreter mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pde_policylearning_tpu.ops import factorized as fz
from pde_policylearning_tpu.ops import fourier
from pde_policylearning_tpu.ops.pallas_kernels import (corner_contract,
                                                       spectral_conv_2d_pallas)


def test_corner_contract_matches_einsum():
    rng = np.random.default_rng(0)
    R, B, M2, I, O = 4, 8, 3, 5, 6
    xr = jnp.asarray(rng.normal(size=(R, B, M2, I)), jnp.float32)
    xi = jnp.asarray(rng.normal(size=(R, B, M2, I)), jnp.float32)
    wr = jnp.asarray(rng.normal(size=(R, M2, I, O)), jnp.float32)
    wi = jnp.asarray(rng.normal(size=(R, M2, I, O)), jnp.float32)
    or_, oi_ = corner_contract(xr, xi, wr, wi, interpret=True)
    x = xr + 1j * xi
    w = wr + 1j * wi
    ref = jnp.einsum("rbmi,rmio->rbmo", x, w)
    np.testing.assert_allclose(np.asarray(or_), np.asarray(ref.real),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(oi_), np.asarray(ref.imag),
                               rtol=1e-4, atol=1e-5)


def test_spectral_conv_2d_pallas_matches_xla():
    key = jax.random.PRNGKey(0)
    half_modes = (4, 3)
    ws = [fz.init_factorized(k, (8, 8, *half_modes), "dense", std=0.1)
          for k in jax.random.split(key, 2)]
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 8),
                          jnp.float32)
    ref = fourier.spectral_conv_nd(x, ws, half_modes)
    out = spectral_conv_2d_pallas(x, ws, half_modes, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=1e-5)


def test_corner_contract_vjp_matches_einsum_grads():
    """The custom VJP (two more fused contractions) must agree with the
    autodiff of the einsum reference."""
    rng = np.random.default_rng(1)
    R, B, M2, I, O = 2, 4, 3, 5, 6
    args = [jnp.asarray(rng.normal(size=s), jnp.float32) for s in
            [(R, B, M2, I), (R, B, M2, I), (R, M2, I, O), (R, M2, I, O)]]

    def loss_pallas(xr, xi, wr, wi):
        or_, oi_ = corner_contract(xr, xi, wr, wi, True)
        return jnp.sum(or_ ** 2) + jnp.sum(or_ * oi_)

    def loss_ref(xr, xi, wr, wi):
        o = jnp.einsum("rbmi,rmio->rbmo", xr + 1j * xi, wr + 1j * wi)
        return jnp.sum(o.real ** 2) + jnp.sum(o.real * o.imag)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(*args)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_spectral_conv_pallas_backend_grad():
    """End-to-end: spectral_conv_nd(backend='pallas') trains — grads match
    the XLA path."""
    key = jax.random.PRNGKey(2)
    half_modes = (3, 3)
    ws = [fz.init_factorized(k, (6, 6, *half_modes), "dense", std=0.1)
          for k in jax.random.split(key, 2)]
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 12, 12, 6), jnp.float32)

    def loss(ws, backend):
        if backend == "pallas":
            out = spectral_conv_2d_pallas(x, ws, half_modes, interpret=True)
        else:
            out = fourier.spectral_conv_nd(x, ws, half_modes)
        return jnp.mean(out ** 2)

    g_p = jax.grad(lambda w: loss(w, "pallas"))(ws)
    g_x = jax.grad(lambda w: loss(w, "xla"))(ws)
    for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_fused_poisson_matches_unfused():
    """envs/poisson_pallas: the fused-VMEM solve must match the XLA path
    (forward and the delegated custom-VJP gradient), interpret mode."""
    from functools import partial as _partial
    from pde_policylearning_tpu.envs import channel_flow as cf
    from pde_policylearning_tpu.envs import poisson_pallas as pp

    grid = cf.make_channel_grid(Nx=8, Ny=17, Nz=8, dtype=jnp.float32)
    rhs = jnp.asarray(np.random.default_rng(3).normal(size=(8, 16, 8)),
                      jnp.float32)
    ref = cf._poisson_solve_unfused(grid, rhs)
    out = pp._solve_impl(grid, rhs, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=1e-6)

    orig = pp._solve_impl
    pp._solve_impl = _partial(orig, interpret=True)
    try:
        g = jax.grad(lambda r: jnp.sum(
            pp.poisson_solve_fused(grid, r) ** 2))(rhs)
    finally:
        pp._solve_impl = orig
    g2 = jax.grad(lambda r: jnp.sum(
        cf._poisson_solve_unfused(grid, r) ** 2))(rhs)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g2),
                               rtol=5e-3, atol=1e-5)
