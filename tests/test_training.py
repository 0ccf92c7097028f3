"""End-to-end slice tests: env-generated dataset -> Trainer -> loss drops."""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pde_policylearning_tpu import models
from pde_policylearning_tpu.data import (PDEDataset, SequentialPDEDataset,
                                         batch_arrays,
                                         generate_channel_dataset)
from pde_policylearning_tpu.training import (Trainer, load_msgpack,
                                             save_msgpack)


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    folder = str(tmp_path_factory.mktemp("channel_data"))
    generate_channel_dataset(
        folder, n_steps=48, policy="gt", detect_plane=3,
        env_kwargs={"Nx": 8, "Ny": 17, "Nz": 8, "dtype": jnp.float64,
                    "noise_scale": 0.05, "detect_plane": 3})
    return folder


def test_dataset_format_and_loading(tiny_dataset):
    import os
    files = os.listdir(tiny_dataset)
    assert "metadata.npy" in files
    assert sum(f.startswith("P_planes") for f in files) == 48
    ds = PDEDataset.from_folder(tiny_dataset, np.arange(32),
                                downsample_rate=1, x_range=8, y_range=8)
    x, y = ds.arrays()
    assert x.shape == (32, 8, 8, 1)
    # normalized data should be roughly standardized
    assert abs(float(jnp.mean(x))) < 1.0

    seq = SequentialPDEDataset.from_folder(tiny_dataset, np.arange(32),
                                           x_range=8, y_range=8, timestep=2)
    xs, ys = seq.arrays()
    assert xs.shape == (16, 2, 8, 8, 1)


def test_batch_arrays():
    x = jnp.arange(10 * 3).reshape(10, 3)
    (xb,) = batch_arrays([x], 4)
    assert xb.shape == (2, 4, 3)
    (xs,) = batch_arrays([x], 4, key=jax.random.PRNGKey(0))
    assert xs.shape == (2, 4, 3)


def test_trainer_loss_decreases(tiny_dataset):
    ds = PDEDataset.from_folder(tiny_dataset, np.arange(40), x_range=8,
                                y_range=8)
    x, y = ds.arrays()
    x_train, y_train = x[:32], y[:32]
    x_test, y_test = x[32:], y[32:]
    model = models.FNO2dObserver(modes1=3, modes2=3, width=8)
    trainer = Trainer(model, n_epochs=30, batch_size=8, learning_rate=2e-3,
                      decoder=ds.v_norm, log_interval=15, verbose=False)
    best_params, hist = trainer.train((x_train, y_train), (x_test, y_test))
    assert hist["train_loss"][-1] < hist["train_loss"][0]
    assert hist["best_loss"] <= hist["test_loss"][0]
    assert np.isfinite(hist["best_loss"])


def test_trainer_sum_reduction_semantics(tiny_dataset):
    """loss_reduction='sum' (the reference's LpLoss(size_average=False)
    train gradient): with weight_decay=0 Adam is scale-invariant so the
    trajectory matches 'mean' to ~eps; reported losses stay on the
    per-sample-mean scale either way."""
    ds = PDEDataset.from_folder(tiny_dataset, np.arange(40), x_range=8,
                                y_range=8)
    x, y = ds.arrays()
    data = ((x[:32], y[:32]), (x[32:], y[32:]))
    model = models.FNO2dObserver(modes1=3, modes2=3, width=8)

    def run(reduction, wd):
        tr = Trainer(model, n_epochs=4, batch_size=8, learning_rate=2e-3,
                     weight_decay=wd, decoder=ds.v_norm, verbose=False,
                     loss_reduction=reduction)
        _, hist = tr.train(*data, rng=jax.random.PRNGKey(0))
        return np.asarray(hist["train_loss"])

    m0, s0 = run("mean", 0.0), run("sum", 0.0)
    # Adam scale invariance at wd=0: same path, and losses reported on the
    # per-sample-mean scale (a raw batch-sum would sit 8x higher)
    np.testing.assert_allclose(s0, m0, rtol=2e-4)
    with pytest.raises(ValueError):
        Trainer(model, n_epochs=1, batch_size=8, loss_reduction="bogus")


@pytest.mark.slow
def test_trainer_bf16_accuracy_delta(tiny_dataset):
    """Mixed-precision (compute_dtype=bf16, master f32): must converge to
    within a small delta of the f32 run (VERDICT r1 item 4c)."""
    ds = PDEDataset.from_folder(tiny_dataset, np.arange(40), x_range=8,
                                y_range=8)
    x, y = ds.arrays()
    x, y = x.astype(jnp.float32), y.astype(jnp.float32)
    train, test = (x[:32], y[:32]), (x[32:], y[32:])
    model = models.FNO2dObserver(modes1=3, modes2=3, width=8)
    kw = dict(n_epochs=20, batch_size=8, learning_rate=2e-3,
              decoder=ds.v_norm, log_interval=20, verbose=False)
    _, h32 = Trainer(model, **kw).train(train, test)
    _, h16 = Trainer(model, compute_dtype=jnp.bfloat16, **kw).train(
        train, test)
    assert np.isfinite(h16["best_loss"])
    assert h16["train_loss"][-1] < h16["train_loss"][0]
    # bf16 path tracks the f32 run
    assert abs(h16["best_loss"] - h32["best_loss"]) < 0.1 * h32["best_loss"] + 0.05


def test_trainer_recurrent(tiny_dataset):
    seq = SequentialPDEDataset.from_folder(tiny_dataset, np.arange(40),
                                           x_range=8, y_range=8, timestep=2)
    xs, ys = seq.arrays()
    y_sel = ys[:, 0]
    model = models.RNO2dObserver(modes1=3, modes2=3, width=8, layer_num=1)
    trainer = Trainer(model, n_epochs=4, batch_size=4, decoder=seq.v_norm,
                      log_interval=4, verbose=False)
    best_params, hist = trainer.train((xs[:16], y_sel[:16]),
                                      (xs[16:], y_sel[16:]))
    assert np.isfinite(hist["test_loss"]).all()


def test_trainer_transformer_observer(tiny_dataset):
    """The transformer observer trains through the same Trainer
    (base_transformer.yaml path)."""
    seq = SequentialPDEDataset.from_folder(tiny_dataset, np.arange(16),
                                           x_range=8, y_range=8, timestep=2)
    xs, ys = seq.arrays()
    model = models.SimpleTransformer(
        node_feats=1, n_hidden=16, n_head=2, freq_dim=8, fourier_modes=3,
        num_encoder_layers=1, num_regressor_layers=1, dropout=0.0)
    trainer = Trainer(model, n_epochs=2, batch_size=4, decoder=seq.v_norm,
                      grad_clip=1.0, log_interval=2, verbose=False)
    params, hist = trainer.train((xs[:6], ys[:6]), (xs[6:], ys[6:]))
    assert np.isfinite(hist["test_loss"]).all()
    multi = trainer.evaluate_multi(params, {"8x8": (xs[6:], ys[6:])})
    assert "8x8" in multi and np.isfinite(multi["8x8"])


def test_checkpoint_roundtrip(tmp_path):
    tree = {"a": jnp.ones((3,)), "b": {"c": jnp.arange(4.0)}}
    path = str(tmp_path / "ckpt.msgpack")
    save_msgpack(path, tree)
    restored = load_msgpack(path, tree)
    np.testing.assert_allclose(np.asarray(restored["b"]["c"]),
                               np.arange(4.0))


def test_trainer_save_resume(tmp_path):
    model = models.FNO2dObserver(modes1=3, modes2=3, width=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 8, 8, 1))
    y = x * 0.5
    trainer = Trainer(model, n_epochs=2, batch_size=8, log_interval=2,
                      verbose=False)
    params, _ = trainer.train((x, y), (x, y))
    path = str(tmp_path / "state.msgpack")
    trainer.save_state(path, params, epoch=2)
    restored = trainer.load_state(path, params)
    assert restored["epoch"] == 2
    leaves_a = jax.tree.leaves(params)
    leaves_b = jax.tree.leaves(restored["params"])
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # resume training from the restored params
    params2, hist2 = trainer.train((x, y), (x, y),
                                   params=restored["params"])
    assert np.isfinite(hist2["train_loss"]).all()


def test_observer_driver_run_control_handoff(tiny_dataset, monkeypatch,
                                             tmp_path):
    """main() with run_control=True hands the trained observer to the
    control loop (run_pde_observers.py:330-332)."""
    import os
    monkeypatch.chdir(tmp_path)
    sys.path.insert(0, "/root/repo")
    import run_pde_observers as driver
    from pde_policylearning_tpu.utils import DotDict
    args = DotDict({
        "DATA_FOLDER": tiny_dataset, "path_name": "t", "exp_name": "ctl",
        "model_name": "FNO2dObserver", "learning_rate": 1e-3,
        "weight_decay": 1e-4, "epochs": 2, "step_size": 100, "gamma": 0.5,
        "modes": 3, "width": 8, "batch_size": 8, "downsample_rate": 1,
        "x_range": 8, "y_range": 8, "ntrain": 24, "ntest": 8,
        "random_split": True, "set_epoch": -1, "log_interval": 2,
        "run_control": True, "control_timestep": 3, "detect_plane": 3,
        "Re": -1, "init_noise_scale": 0.02, "log_interval_control": 3,
    })
    # keep the control env tiny: monkeypatch NSControlEnv defaults
    import run_control as rc
    orig = rc.NSControlEnv

    def tiny_env(**kw):
        kw.update({"Nx": 8, "Ny": 17, "Nz": 8})
        return orig(**kw)

    monkeypatch.setattr(rc, "NSControlEnv", tiny_env)
    best_params, hist = driver.main(args)
    assert np.isfinite(hist["best_loss"])


@pytest.mark.slow
def test_observer_driver_recurrent(tiny_dataset, monkeypatch, tmp_path):
    """Driver main() through the recurrent (SequentialPDEDataset/RNO)
    branch (run_pde_observers.py recurrent_model path)."""
    import os
    monkeypatch.chdir(tmp_path)
    sys.path.insert(0, "/root/repo")
    import run_pde_observers as driver
    from pde_policylearning_tpu.utils import DotDict
    args = DotDict({
        "DATA_FOLDER": tiny_dataset, "path_name": "test", "exp_name": "rno",
        "model_name": "RNO2dObserver", "learning_rate": 1e-3,
        "weight_decay": 1e-4, "epochs": 2, "step_size": 100, "gamma": 0.5,
        "modes": 3, "width": 8, "batch_size": 4, "downsample_rate": 1,
        "x_range": 8, "y_range": 8, "ntrain": 24, "ntest": 8,
        "random_split": True, "set_epoch": -1, "log_interval": 2,
        "recurrent_model": True, "model_timestep": 2, "recurrent_index": 0,
        "layer_num": 1,
    })
    best_params, hist = driver.main(args)
    assert os.path.exists("./outputs/test_rno.msgpack")
    assert np.isfinite(hist["best_loss"])


def test_observer_driver_main(tiny_dataset, monkeypatch, tmp_path):
    """Drive run_pde_observers.main end-to-end on the tiny dataset."""
    import os
    monkeypatch.chdir(tmp_path)
    sys.path.insert(0, "/root/repo")
    import run_pde_observers as driver
    from pde_policylearning_tpu.utils import DotDict
    args = DotDict({
        "DATA_FOLDER": tiny_dataset, "path_name": "test", "exp_name": "t0",
        "model_name": "FNO2dObserver", "learning_rate": 1e-3,
        "weight_decay": 1e-4, "epochs": 4, "step_size": 100, "gamma": 0.5,
        "modes": 3, "width": 8, "batch_size": 8, "downsample_rate": 1,
        "x_range": 8, "y_range": 8, "ntrain": 32, "ntest": 8,
        "random_split": True, "set_epoch": -1, "log_interval": 4,
    })
    best_params, hist = driver.main(args)
    assert os.path.exists("./outputs/test_t0.msgpack")
    assert np.isfinite(hist["best_loss"])
