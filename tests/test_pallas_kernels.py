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
