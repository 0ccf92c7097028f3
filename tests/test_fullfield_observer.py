"""Physics-informed full-field observer training test."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pde_policylearning_tpu import models
from pde_policylearning_tpu.data import (FullFieldNSDataset,
                                         generate_channel_dataset)
from pde_policylearning_tpu.envs import channel_flow as cf
from pde_policylearning_tpu.training.observer_fullfield import \
    train_fullfield_observer


def test_fullfield_training_with_pde_loss(tmp_path):
    folder = str(tmp_path / "ff")
    generate_channel_dataset(
        folder, n_steps=8, policy="gt", detect_plane=3, save_fields=True,
        env_kwargs={"Nx": 8, "Ny": 17, "Nz": 8, "dtype": jnp.float64,
                    "noise_scale": 0.05, "detect_plane": 3})
    ds = FullFieldNSDataset.from_folder(folder, np.arange(8),
                                        plane_indexs=[-2, -4], timestep=1)
    assert ds.v_plane.shape == (8, 1, 8, 8)
    assert ds.v_field.shape == (8, 1, 2, 8, 8)

    grid = cf.make_channel_grid(Nx=8, Ny=17, Nz=8)
    model = models.PINObserverFullField(
        plane_num=2, modes1=(2, 2), modes2=(2, 2), modes3=(1, 1),
        layers=(8, 8, 8), fc_dim=8, in_dim=1)
    params, hist = train_fullfield_observer(
        model, ds, grid, plane_indexs=[-2, -4], n_epochs=4, batch_size=2,
        pde_loss_weight=0.1, verbose=False)
    assert np.isfinite(hist["total"]).all()
    assert hist["pde"][-1] >= 0
    assert hist["total"][-1] < hist["total"][0] * 2
