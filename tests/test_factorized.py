"""Tests for factorized complex weight pytrees.

Mirrors the reference's factorized-vs-dense equivalence strategy
(neuralop/models/tests/test_spectral_convolution.py:10-50).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pde_policylearning_tpu.ops import factorized as fz


@pytest.mark.parametrize("factorization", ["dense", "tucker", "cp", "tt"])
@pytest.mark.parametrize("shape", [(4, 6, 5, 3), (3, 3, 4)])
def test_reconstructed_vs_factorized_contraction(factorization, shape):
    key = jax.random.PRNGKey(0)
    params = fz.init_factorized(key, shape, factorization, rank=0.9, std=0.5)
    order = len(shape) - 2
    batch = 2
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (batch, *shape[2:], shape[0])) + 0j

    out_rec = fz.contract(x, params, implementation="reconstructed")
    out_fac = fz.contract(x, params, implementation="factorized")
    np.testing.assert_allclose(np.asarray(out_rec), np.asarray(out_fac),
                               rtol=1e-4, atol=1e-5)
    assert out_rec.shape == (batch, *shape[2:], shape[1])


@pytest.mark.parametrize("factorization", ["dense", "tucker", "cp", "tt"])
def test_to_dense_shape(factorization):
    shape = (4, 8, 6, 4)
    params = fz.init_factorized(jax.random.PRNGKey(2), shape, factorization,
                                rank=0.5)
    dense = fz.to_dense(params)
    assert dense.shape == shape
    assert jnp.iscomplexobj(dense)


def test_factorization_compresses():
    shape = (16, 16, 8, 8)
    dense_n = fz.n_dense_params(shape)
    for kind in ["tucker", "cp", "tt"]:
        params = fz.init_factorized(jax.random.PRNGKey(0), shape, kind,
                                    rank=0.5)
        assert fz.n_params(params) < dense_n, kind


def test_separable_contraction():
    shape = (5, 7, 4)  # (in_ch, m1, m2) for separable
    params = fz.init_factorized(jax.random.PRNGKey(3), shape, "dense")
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 7, 4, 5)) + 0j
    out = fz.contract(x, params, separable=True)
    assert out.shape == x.shape


def test_grad_flows_through_factors():
    shape = (3, 4, 5, 3)
    params = fz.init_factorized(jax.random.PRNGKey(5), shape, "tucker",
                                rank=0.7)
    x = jnp.ones((1, 5, 3, 3), jnp.complex64)

    def loss(p):
        return jnp.sum(jnp.abs(fz.contract(x, p, implementation="factorized")))

    g = jax.grad(loss)(params)
    for leaf in jax.tree.leaves(g):
        assert jnp.all(jnp.isfinite(leaf))
        assert float(jnp.sum(jnp.abs(leaf))) > 0
