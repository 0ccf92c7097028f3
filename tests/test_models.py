"""Model-layer tests, mirroring neuralop/models/tests/test_tfno.py (forward +
backward smoke over factorization x implementation x n_dim) and
test_fno_block.py."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pde_policylearning_tpu import models


def _init_and_run(model, *args, **kwargs):
    variables = model.init(jax.random.PRNGKey(0), *args, **kwargs)
    out = model.apply(variables, *args, **kwargs)
    return variables, out


@pytest.mark.parametrize("factorization,implementation,n_dim", [
    # full factorization x implementation grid at n_dim=2 …
    (None, "reconstructed", 2),
    ("tucker", "reconstructed", 2),
    ("tucker", "factorized", 2),
    ("cp", "factorized", 2),
    ("tt", "factorized", 2),
    # … and dimension sweep with dense weights (slow: the 2-d grid above
    # already exercises the core path every run)
    pytest.param(None, "reconstructed", 1, marks=pytest.mark.slow),
    pytest.param(None, "reconstructed", 3, marks=pytest.mark.slow),
])
def test_fno_forward_backward(factorization, implementation, n_dim):
    modes = (6,) * n_dim
    spatial = (12,) * n_dim
    model = models.FNO(
        n_modes=modes, hidden_channels=8, in_channels=3, out_channels=1,
        n_layers=2, lifting_channels=16, projection_channels=16,
        factorization=factorization, implementation=implementation, rank=0.5)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, *spatial, 3))
    variables, out = _init_and_run(model, x)
    assert out.shape == (2, *spatial, 1)

    def loss(params):
        return jnp.sum(model.apply({"params": params}, x) ** 2)

    g = jax.grad(loss)(variables["params"])
    leaves = jax.tree.leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    assert any(float(jnp.max(jnp.abs(l))) > 0 for l in leaves)


@pytest.mark.parametrize("norm", [None, "instance_norm", "group_norm"])
@pytest.mark.parametrize("preactivation", [False, True])
def test_fno_block_variants(norm, preactivation):
    model = models.FNO(
        n_modes=(4, 4), hidden_channels=8, in_channels=2, out_channels=2,
        n_layers=2, lifting_channels=8, projection_channels=8,
        use_mlp=True, norm=norm, preactivation=preactivation,
        fno_skip="soft-gating" if preactivation else "linear")
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 10, 10, 2))
    _, out = _init_and_run(model, x)
    assert out.shape == (2, 10, 10, 2)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_fno_ada_in():
    model = models.FNO(
        n_modes=(4, 4), hidden_channels=8, in_channels=2, out_channels=1,
        n_layers=1, lifting_channels=8, projection_channels=8, norm="ada_in")
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 2))
    emb = jnp.ones((4,))
    variables = model.init(jax.random.PRNGKey(0), x, ada_embedding=emb)
    out = model.apply(variables, x, ada_embedding=emb)
    assert out.shape == (2, 8, 8, 1)


def test_fno_domain_padding_and_scaling():
    model = models.FNO(
        n_modes=(4, 4), hidden_channels=8, in_channels=1, out_channels=1,
        n_layers=2, lifting_channels=8, projection_channels=8,
        domain_padding=0.25)
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 16, 16, 1))
    _, out = _init_and_run(model, x)
    assert out.shape == (1, 16, 16, 1)

    scaled = models.FNO(
        n_modes=(4, 4), hidden_channels=8, in_channels=1, out_channels=1,
        n_layers=2, lifting_channels=8, projection_channels=8,
        output_scaling_factor=[2.0, 1.0])
    _, out2 = _init_and_run(scaled, x)
    assert out2.shape == (1, 32, 32, 1)


def test_joint_factorization():
    model = models.FNO(
        n_modes=(4, 4), hidden_channels=8, in_channels=1, out_channels=1,
        n_layers=3, lifting_channels=8, projection_channels=8,
        factorization="tucker", joint_factorization=True, rank=0.5)
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 12, 12, 1))
    variables, out = _init_and_run(model, x)
    assert out.shape == (1, 12, 12, 1)
    # one shared weight tensor, not one per layer
    conv_params = variables["params"]["fno_blocks"]["convs"]
    assert "weight" in conv_params


def test_incremental_n_modes():
    model = models.FNO(
        n_modes=(8, 8), hidden_channels=8, in_channels=1, out_channels=1,
        n_layers=1, lifting_channels=8, projection_channels=8,
        incremental_n_modes=(4, 4))
    x = jax.random.normal(jax.random.PRNGKey(6), (1, 16, 16, 1))
    _, out = _init_and_run(model, x)
    assert out.shape == (1, 16, 16, 1)


def test_incremental_modes_grow_during_training():
    """The incremental-modes curriculum (spectral_convolution.py:286-301):
    weights always hold the full mode count, so a model reconfigured with
    more active modes reuses the SAME params mid-training."""
    kwargs = dict(n_modes=(8, 8), hidden_channels=8, in_channels=1,
                  out_channels=1, n_layers=1, lifting_channels=8,
                  projection_channels=8)
    small = models.FNO(incremental_n_modes=(4, 4), **kwargs)
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 16, 16, 1))
    params = small.init(jax.random.PRNGKey(0), x)["params"]
    out_small = small.apply({"params": params}, x)
    full = models.FNO(incremental_n_modes=None, **kwargs)
    out_full = full.apply({"params": params}, x)  # same params, more modes
    assert out_full.shape == out_small.shape
    # different active modes -> different outputs, both finite
    assert float(jnp.max(jnp.abs(out_full - out_small))) > 0
    assert bool(jnp.isfinite(out_full).all())


def test_tfno_is_tucker():
    m = models.TFNO(n_modes=(4, 4), hidden_channels=8, in_channels=1,
                    lifting_channels=8, projection_channels=8, n_layers=1,
                    rank=0.5)
    x = jnp.ones((1, 8, 8, 1))
    variables = m.init(jax.random.PRNGKey(0), x)
    conv = variables["params"]["fno_blocks"]["convs"]
    assert "core" in conv["w0"]  # tucker parametrization


def test_dispatcher():
    config = {
        "arch": "tfno2d",
        "tfno2d": {
            "data_channels": 3,
            "n_modes_height": 4,
            "n_modes_width": 4,
            "hidden_channels": 8,
            "lifting_channels": 8,
            "projection_channels": 8,
            "n_layers": 2,
        },
        "patching": {"levels": 0},
    }
    model = models.get_model(config)
    x = jnp.ones((1, 8, 8, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (1, 8, 8, 1)


def test_rno_forward_and_rollout():
    model = models.RNO2d(modes1=4, modes2=4, width=8, recurrent_index=0,
                         layer_num=2)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 3, 8, 8, 1))
    variables = model.init(jax.random.PRNGKey(0), x, timestep=2)
    out = model.apply(variables, x, timestep=2)
    assert out.shape == (2, 8, 8, 1)
    preds = model.apply(variables, x, timestep=3,
                        method=lambda m, x, timestep: m.predict(x, timestep))
    assert preds.shape == (2, 3, 8, 8, 1)
    assert bool(jnp.all(jnp.isfinite(preds)))


def test_rno_grad():
    model = models.RNO2d(modes1=4, modes2=4, width=8, layer_num=1)
    x = jax.random.normal(jax.random.PRNGKey(8), (1, 2, 8, 8, 1))
    y = jax.random.normal(jax.random.PRNGKey(9), (1, 8, 8, 1))
    variables = model.init(jax.random.PRNGKey(0), x)

    def loss(params):
        pred = model.apply({"params": params}, x)
        return jnp.mean((pred - y) ** 2)

    g = jax.grad(loss)(variables["params"])
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in jax.tree.leaves(g))


def test_observers():
    p = jax.random.normal(jax.random.PRNGKey(10), (2, 16, 16, 1))
    fno_obs = models.FNO2dObserver(modes1=4, modes2=4, width=8)
    v, out = _init_and_run(fno_obs, p)
    assert out.shape == (2, 16, 16, 1)

    unet = models.UNet(use_spectral_conv=True, modes=4)
    variables = unet.init(jax.random.PRNGKey(0), p)
    out = unet.apply(variables, p)
    assert out.shape == (2, 16, 16, 1)

    seq = jax.random.normal(jax.random.PRNGKey(11), (2, 2, 16, 16, 1))
    rno_obs = models.RNO2dObserver(modes1=4, modes2=4, width=8, layer_num=1)
    variables = rno_obs.init(jax.random.PRNGKey(0), seq)
    out = rno_obs.apply(variables, seq)
    assert out.shape == (2, 16, 16, 1)
