"""PINO mixed/progressive/Burgers training variants."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from pde_policylearning_tpu import models
from pde_policylearning_tpu.data import KFDataset
from pde_policylearning_tpu.training.pino_train import (mixed_train,
                                                        progressive_train,
                                                        train_2d_burger)


def _small_kf():
    return KFDataset.generate(jax.random.PRNGKey(0), n_traj=4, S=16, T=5,
                              re=40.0)


def test_mixed_train_runs():
    ds = _small_kf()
    model = models.PINObserver2d(modes1=(3, 3), modes2=(3, 3),
                                 modes3=(2, 2), layers=(8, 8, 8), fc_dim=16)
    params, hist = mixed_train(model, ds.arrays(), iterations=4,
                               batch_size=2, eq_batch_size=2,
                               log_interval=2, verbose=False)
    assert np.isfinite(hist["data"]).all()
    assert np.isfinite(hist["eq"]).all()


@pytest.mark.slow
def test_progressive_train_runs():
    coarse = _small_kf()
    model = models.PINObserver2d(modes1=(3, 3), modes2=(3, 3),
                                 modes3=(2, 2), layers=(8, 8, 8), fc_dim=16)
    params, hist = progressive_train(
        model, [coarse.arrays(), coarse.arrays()], iters_per_stage=4,
        batch_size=2, log_interval=4, verbose=False)
    assert len(hist) == 2


def test_train_2d_burger():
    rng = np.random.default_rng(0)
    nx, nt, n = 16, 6, 8
    u0 = jnp.asarray(rng.normal(size=(n, nx)), jnp.float32)
    u = jnp.asarray(rng.normal(size=(n, nt, nx)), jnp.float32)
    # a 2-D FNO over (t, x)
    model = models.FNO(n_modes=(3, 3), hidden_channels=8, in_channels=1,
                       out_channels=1, n_layers=2, lifting_channels=8,
                       projection_channels=8)
    params, hist = train_2d_burger(model, (u0, u), iterations=6,
                                   batch_size=4, log_interval=3,
                                   verbose=False)
    assert np.isfinite(hist["total"]).all()
