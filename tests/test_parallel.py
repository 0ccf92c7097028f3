"""Mesh + multigrid patching tests on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from pde_policylearning_tpu import models
from pde_policylearning_tpu.parallel import (MultigridPatching2D, make_mesh,
                                             make_mg_patches, make_patches,
                                             replicate, shard_batch,
                                             split_batch_size,
                                             stitch_patches)


def test_mesh_shapes():
    mesh = make_mesh(model_parallel_size=2)
    assert mesh.shape["data"] == 4
    assert mesh.shape["model"] == 2
    assert split_batch_size(8, mesh) == 2
    with pytest.raises(ValueError):
        split_batch_size(6, mesh)


def test_make_patches_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    p = make_patches(x, n=4, p=0)
    assert p.shape == (2 * 16, 4, 4, 3)
    back = stitch_patches(p, 4)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_make_patches_padding_is_circular():
    x = jnp.arange(16.0).reshape(1, 4, 4, 1)
    p = make_patches(x, n=2, p=1)
    assert p.shape == (4, 4, 4, 1)
    # top-left patch's halo row comes from the bottom row (wrap)
    np.testing.assert_allclose(np.asarray(p[0, 0, 1:3, 0]),
                               np.asarray(x[0, -1, 0:2, 0]))


def test_mg_patches_channels():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    mg = make_mg_patches(x, levels=2, padding_fraction=0.125)
    # 2^2 x 2^2 patches, channels x (levels+1)
    assert mg.shape[0] == 2 * 16
    assert mg.shape[-1] == 3 * 3
    # fine channels of patch 0 match the plain patch extraction
    plain = make_patches(x, 4, [2, 2])
    np.testing.assert_allclose(np.asarray(mg[..., :3]), np.asarray(plain))


def test_mg_patching_wrapper_stitch():
    patcher = MultigridPatching2D(levels=1, padding_fraction=0.25)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 1))
    y = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 1))
    px, py = patcher.patch(x, y)
    assert px.shape[0] == 2 * 4
    assert px.shape[-1] == 2
    # a model that keeps spatial size
    out = px[..., :1] * 2.0
    sx, sy = patcher.unpatch(out, py)
    assert sx.shape == (2, 8, 8, 1)
    # center content = 2 * x
    np.testing.assert_allclose(np.asarray(sx), np.asarray(2 * x), rtol=1e-6)


def test_sharded_env_step_matches_unsharded():
    """x-sharded DNS stepping over the mesh == single-device stepping
    (XLA SPMD inserts the halo exchanges for the periodic rolls)."""
    from pde_policylearning_tpu.envs import channel_flow as cf
    from pde_policylearning_tpu.parallel import (shard_env_state,
                                                 sharded_rollout,
                                                 sharded_step)
    # x-sharding degree must be <= sqrt(Nx) for XLA's distributed FFT
    mesh = make_mesh(model_parallel_size=4)
    grid = cf.make_channel_grid(Nx=16, Ny=17, Nz=8, dtype=jnp.float64)
    state = cf.init_state(grid, key=jax.random.PRNGKey(0), noise=0.02)
    z = jnp.zeros((16, 8))
    ref = cf.rk3_step(grid, state, z, z)

    sstate = shard_env_state(mesh, state)
    out = sharded_step(mesh, grid, sstate, z, z)
    np.testing.assert_allclose(np.asarray(out.U), np.asarray(ref.U),
                               rtol=1e-12, atol=1e-14)
    # sharded rollout stays consistent over several steps
    final, p2s = sharded_rollout(mesh, grid, sstate, 3, detect_plane=3)
    r = state
    for _ in range(3):
        o1, o2 = cf.gt_control(r, 3)
        r = cf.rk3_step(grid, r, o1, o2)
    np.testing.assert_allclose(np.asarray(final.U), np.asarray(r.U),
                               rtol=1e-10, atol=1e-12)
    assert p2s.shape == (3, 16, 8)


def test_trainer_with_mesh():
    """Trainer data-parallel path: dataset sharded over 'data', params
    replicated, loss decreases."""
    from pde_policylearning_tpu.training import Trainer
    mesh = make_mesh(model_parallel_size=1)
    model = models.FNO2dObserver(modes1=3, modes2=3, width=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (32, 8, 8, 1))
    y = x * 0.5
    trainer = Trainer(model, n_epochs=6, batch_size=8, learning_rate=2e-3,
                      log_interval=3, mesh=mesh, verbose=False)
    params, hist = trainer.train((x[:24], y[:24]), (x[24:], y[24:]))
    assert hist["train_loss"][-1] < hist["train_loss"][0]


def test_sharded_mg_training_step():
    """Full DP x MP training step: batch on 'data', patch-batch on 'model'."""
    mesh = make_mesh(model_parallel_size=2)
    patcher = MultigridPatching2D(levels=1, padding_fraction=0.25, mesh=mesh,
                                  stitching=True)
    model = models.FNO2dObserver(modes1=3, modes2=3, width=8)

    x = jax.random.normal(jax.random.PRNGKey(0), (8, 8, 8, 2))
    y = jax.random.normal(jax.random.PRNGKey(1), (8, 8, 8, 1))
    x, y = shard_batch(mesh, x, y)

    fno = models.FNO(n_modes=(3, 3), hidden_channels=8, in_channels=4,
                     out_channels=1, n_layers=1, lifting_channels=8,
                     projection_channels=8)
    px, _ = patcher.patch(x, y)
    params = jax.jit(fno.init)(jax.random.PRNGKey(2), px)["params"]
    params = replicate(mesh, params)
    opt = optax.adam(1e-3)
    opt_state = replicate(mesh, opt.init(params))

    @jax.jit
    def train_step(params, opt_state, x, y):
        def loss_fn(p):
            px, py = patcher.patch(x, y)
            out = fno.apply({"params": p}, px)
            sx, sy = patcher.unpatch(out, py)
            return jnp.mean((sx - sy) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, s = opt.update(g, opt_state)
        return optax.apply_updates(params, updates), s, loss

    p2, s2, loss = train_step(params, opt_state, x, y)
    assert jnp.isfinite(loss)
    # params changed and remain finite on all devices
    delta = jax.tree.reduce(
        lambda acc, l: acc + float(jnp.sum(jnp.abs(l))), jax.tree.map(
            lambda a, b: a - b, p2, params), 0.0)
    assert delta > 0


def test_data_parallel_rollout_matches_unsharded():
    """One env per device over 'data': must equal the unsharded batched
    rollout bit-for-bit (no cross-env communication)."""
    from pde_policylearning_tpu.envs import channel_flow as cf
    from pde_policylearning_tpu.parallel import (data_parallel_rollout,
                                                 make_mesh)
    mesh = make_mesh(model_parallel_size=1)
    grid = cf.make_channel_grid(Nx=8, Ny=17, Nz=8)
    states = cf.init_batched_states(grid, 8, jax.random.PRNGKey(0),
                                    noise=0.02)
    ref_states, ref_outs = cf.batched_rollout(grid, states, 3,
                                              detect_plane=3, policy="gt")
    dp_states, dp_outs = data_parallel_rollout(mesh, grid, states, 3,
                                               detect_plane=3, policy="gt")
    np.testing.assert_allclose(np.asarray(dp_states.U),
                               np.asarray(ref_states.U), rtol=1e-4,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(dp_outs[0]),
                               np.asarray(ref_outs[0]), rtol=1e-4,
                               atol=1e-6)


def test_fused_dft_conv_under_dp_sharding(monkeypatch):
    """backend='dft_fused' stacks re/im as a 2B leading axis — it must stay
    GSPMD-partitionable and exact when the batch is sharded over 'data'
    (the pretrain runs DP with PDE_SPECTRAL_BACKEND=dft_fused)."""
    from pde_policylearning_tpu.ops import factorized, fourier
    mesh = make_mesh(model_parallel_size=1)
    hm = (3, 3)
    key = jax.random.PRNGKey(3)
    ws = [factorized.init_factorized(jax.random.fold_in(key, i),
                                     (4, 4, *hm), "dense") for i in range(2)]
    x = jax.random.normal(key, (8, 12, 12, 4))
    ref = fourier.spectral_conv_nd(x, ws, hm, backend="xla")
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    out = jax.jit(lambda x, w: fourier.spectral_conv_nd(
        x, w, hm, backend="dft_fused"))(xs, ws)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-6)
