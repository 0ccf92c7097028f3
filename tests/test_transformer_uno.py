"""Galerkin/Fourier transformer + UNO tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pde_policylearning_tpu import models


def test_linear_attention_matches_quadratic_identity():
    """Galerkin Q(K^T V)/n == (Q K^T) V / n without softmax."""
    key = jax.random.PRNGKey(0)
    q, k, v = [jax.random.normal(kk, (2, 2, 16, 8))
               for kk in jax.random.split(key, 3)]
    lin, _ = models.linear_attention(q, k, v, "galerkin")
    quad = jnp.einsum("bhnd,bhmd->bhnm", q, k) @ v / 16
    np.testing.assert_allclose(np.asarray(lin), np.asarray(quad),
                               rtol=1e-5, atol=1e-6)


def test_fourier_attention_fast_path_matches_quadratic():
    """SimpleAttention's associativity rewrite of 'fourier' attention
    returns the same numbers as the explicit (QK^T/(sqrt(d)n))V score
    path (attention_layers.py:636-670 — no softmax between matmuls)."""
    from pde_policylearning_tpu.models.transformer import SimpleAttention
    att = SimpleAttention(n_head=2, d_model=16, attention_type="fourier",
                          pos_dim=0, dropout=0.0, norm=True)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 24, 16))
    params = att.init(jax.random.PRNGKey(4), x, x, x)
    out_fast, _ = att.apply(params, x, x, x)
    # an all-ones mask is a no-op in attention()'s 'fourier' branch but
    # forces the explicit quadratic score path
    out_quad, _ = att.apply(params, x, x, x, mask=jnp.ones((24, 24)))
    np.testing.assert_allclose(np.asarray(out_fast), np.asarray(out_quad),
                               rtol=2e-5, atol=2e-6)


def test_causal_linear_attention_is_causal():
    key = jax.random.PRNGKey(1)
    q, k, v = [jax.random.normal(kk, (1, 1, 12, 4))
               for kk in jax.random.split(key, 3)]
    out1, _ = models.causal_linear_attention(q, k, v)
    # changing a later token must not change earlier outputs
    v2 = v.at[:, :, -1].set(99.0)
    k2 = k.at[:, :, -1].set(99.0)
    out2, _ = models.causal_linear_attention(q, k2, v2)
    np.testing.assert_allclose(np.asarray(out1[:, :, :6]),
                               np.asarray(out2[:, :, :6]), rtol=1e-4)


def _reference_freq_attention_fourier(q, k, v, modes):
    """NumPy port of the reference freq_attention 'fourier' branch
    (attention_layers.py:578-621): rfft(ortho) over tokens, truncate to
    `modes`, scores = plain complex product q_ft k_ft^T / sqrt(d_k)
    (att_complex_matmul_1d, :565-574 — NO conjugation), p = scores/seq_len,
    out = irfft(p v_ft, n=seq_len)."""
    seq_len, d_k = q.shape[-2], q.shape[-1]
    qf = np.fft.rfft(np.swapaxes(q, -1, -2), n=seq_len, norm="ortho")
    kf = np.fft.rfft(np.swapaxes(k, -1, -2), n=seq_len, norm="ortho")
    vf = np.fft.rfft(np.swapaxes(v, -1, -2), n=seq_len, norm="ortho")
    qf = np.swapaxes(qf[..., :modes], -1, -2)  # (B,H,m,D)
    kf = np.swapaxes(kf[..., :modes], -1, -2)
    vf = np.swapaxes(vf[..., :modes], -1, -2)
    scores = np.einsum("bhnd,bhmd->bhnm", qf, kf) / np.sqrt(d_k)
    p = scores / seq_len
    outf = np.einsum("bhnm,bhmd->bhnd", p, vf)
    out = np.fft.irfft(np.swapaxes(outf, -1, -2), n=seq_len, norm="ortho")
    return np.swapaxes(out, -1, -2)


def test_freq_attention_parity_with_reference():
    key = jax.random.PRNGKey(8)
    q, k, v = [jax.random.normal(kk, (2, 2, 16, 8))
               for kk in jax.random.split(key, 3)]
    out, _ = models.freq_attention(q, k, v, attention_type="fourier",
                                   modes=5)
    want = _reference_freq_attention_fourier(
        np.asarray(q), np.asarray(k), np.asarray(v), modes=5)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("attention_type",
                         ["fourier", "galerkin", "linear", "softmax"])
def test_encoder_layer_variants(attention_type):
    layer = models.SimpleTransformerEncoderLayer(
        d_model=16, n_head=2, dim_feedforward=32,
        attention_type=attention_type, dropout=0.0)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 24, 16))
    pos = jax.random.normal(jax.random.PRNGKey(3), (2, 24, 1))
    params = layer.init(jax.random.PRNGKey(0), x, pos)
    out, attn = layer.apply(params, x, pos)
    assert out.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_simple_transformer_forward_backward():
    model = models.SimpleTransformer(
        node_feats=1, n_hidden=16, n_head=2, freq_dim=8, fourier_modes=3,
        num_encoder_layers=2, num_regressor_layers=2,
        attention_type="fourier", dropout=0.0)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 2, 8, 8, 1))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    out = model.apply({"params": params}, x)
    assert out.shape == (2, 2, 8, 8, 1)

    def loss(p):
        return jnp.mean(model.apply({"params": p}, x) ** 2)

    g = jax.grad(loss)(params)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in jax.tree.leaves(g))


def test_fourier_transformer_2d():
    model = models.FourierTransformer2D(
        n_hidden=16, n_head=2, freq_dim=8, fourier_modes=3,
        num_encoder_layers=2, attention_type="galerkin", dropout=0.0)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    out = model.apply({"params": params}, x)
    assert out.shape == (2, 16, 16, 1)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_bulk_regressor():
    m = models.BulkRegressor(n_targets=3, pred_len=5)
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 32, 8))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (2, 5, 3)


def test_uno_forward_backward():
    model = models.UNO(
        in_channels=2, out_channels=1, hidden_channels=8,
        lifting_channels=8, projection_channels=8, n_layers=4,
        uno_out_channels=[8, 8, 8, 8],
        uno_n_modes=[[3, 3]] * 4,
        uno_scalings=[[1.0, 1.0], [0.5, 0.5], [1.0, 1.0], [2.0, 2.0]],
        factorization=None, rank=0.5)  # tucker grads covered in the FNO
    # factorization sweep; dense halves this test's compile time
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 16, 16, 2))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    out = model.apply({"params": params}, x)
    assert out.shape == (2, 16, 16, 1)

    def loss(p):
        return jnp.mean(model.apply({"params": p}, x) ** 2)

    g = jax.grad(loss)(params)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in jax.tree.leaves(g))


def test_uno_in_dispatcher():
    config = {
        "arch": "uno",
        "uno": {
            "data_channels": 2, "out_channels": 1, "hidden_channels": 8,
            "lifting_channels": 8, "projection_channels": 8, "n_layers": 2,
            "uno_out_channels": [8, 8], "uno_n_modes": [[3, 3], [3, 3]],
            "uno_scalings": [[1.0, 1.0], [1.0, 1.0]],
        },
    }
    model = models.get_model(config)
    x = jnp.ones((1, 8, 8, 2))
    params = model.init(jax.random.PRNGKey(0), x)
    assert model.apply(params, x).shape == (1, 8, 8, 1)
