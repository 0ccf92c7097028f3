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


def test_dense_storage_is_mode_major():
    # TPU: trailing (8, 8) mode axes would tile-pad 16x on every stored
    # copy (Adam moments, grads, remat); storage puts channels last.
    shape = (16, 12, 8, 8)
    params = fz.init_factorized(jax.random.PRNGKey(0), shape, "dense")
    assert "mm2" in params
    assert params["mm2"].shape == (2, 8, 8, 16, 12)
    assert fz.to_dense(params).shape == shape


def test_legacy_tensor_leaves_still_work():
    shape = (4, 6, 5, 3)
    key = jax.random.PRNGKey(7)
    new = fz.init_factorized(key, shape, "dense", std=0.5)
    # rebuild the legacy layout from the same values
    dense = fz.to_dense(new)
    old = {"tensor": jnp.stack([dense.real, dense.imag])}
    np.testing.assert_allclose(np.asarray(fz.to_dense(old)),
                               np.asarray(dense), rtol=1e-6)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 3, 4)) + 0j
    np.testing.assert_allclose(np.asarray(fz.contract(x, old)),
                               np.asarray(fz.contract(x, new)),
                               rtol=1e-5, atol=1e-6)


def test_take_layer_mode_major():
    shape = (3, 4, 6, 5, 2)  # (L, I, O, m1, m2)
    params = fz.init_factorized(jax.random.PRNGKey(9), shape, "dense",
                                n_lead=3)
    assert "mm3" in params
    full = fz.to_dense(params)
    sub = fz.take_layer(params, 1)
    assert "mm2" in sub
    np.testing.assert_allclose(np.asarray(fz.to_dense(sub)),
                               np.asarray(full[1]), rtol=1e-6)


def test_slice_weight_modes_mode_major():
    from pde_policylearning_tpu.ops import fourier
    shape = (4, 6, 8, 5)
    params = fz.init_factorized(jax.random.PRNGKey(11), shape, "dense")
    sliced = fourier.slice_weight_modes(params, (3, 2))
    np.testing.assert_allclose(
        np.asarray(fz.to_dense(sliced)),
        np.asarray(fz.to_dense(params)[:, :, :3, :2]), rtol=1e-6)


def test_checkpoint_adapts_legacy_dense_layout(tmp_path):
    from pde_policylearning_tpu.training import load_msgpack, save_msgpack
    shape = (4, 6, 5, 3)
    new = {"layer": {"w0": fz.init_factorized(jax.random.PRNGKey(3), shape,
                                              "dense", std=0.5)}}
    dense = fz.to_dense(new["layer"]["w0"])
    old = {"layer": {"w0": {"tensor": jnp.stack([dense.real, dense.imag])}}}
    p = str(tmp_path / "legacy.msgpack")
    save_msgpack(p, old)
    restored = load_msgpack(p, new)
    np.testing.assert_allclose(
        np.asarray(fz.to_dense(restored["layer"]["w0"])),
        np.asarray(dense), rtol=1e-6)
    # and the reverse: new-layout file into a legacy-structured target
    p2 = str(tmp_path / "new.msgpack")
    save_msgpack(p2, new)
    restored2 = load_msgpack(p2, old)
    np.testing.assert_allclose(
        np.asarray(fz.to_dense(restored2["layer"]["w0"])),
        np.asarray(dense), rtol=1e-6)
