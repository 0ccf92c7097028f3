"""PINO subsystem tests: models, residual losses, synthetic data, training."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pde_policylearning_tpu import models
from pde_policylearning_tpu.data import KFDataset, gaussian_rf_2d, \
    ns_vorticity_rollout
from pde_policylearning_tpu.ops import pde_losses
from pde_policylearning_tpu.training.pino_train import eval_ns, train_ns


def test_pinobserver2d_shapes():
    model = models.PINObserver2d(modes1=(3, 3), modes2=(3, 3),
                                 modes3=(2, 2), layers=(8, 8, 8),
                                 fc_dim=16, in_dim=4)
    a = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 5, 4))
    re = jnp.full((2,), 40.0)
    params = model.init(jax.random.PRNGKey(1), a, re)["params"]
    out = model.apply({"params": params}, a, re)
    assert out.shape == (2, 8, 8, 5, 1)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_pinobserver_fullfield_and_policy():
    model = models.PINObserverFullField(
        plane_num=3, modes1=(3, 3), modes2=(3, 3), modes3=(1, 1),
        layers=(8, 8, 8), fc_dim=16, in_dim=1)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 1, 1))
    re = jnp.full((2,), 180.0)
    params = model.init(jax.random.PRNGKey(1), x, re)["params"]
    out = model.apply({"params": params}, x, re)
    assert out.shape == (2, 3, 8, 8, 1)

    pol = models.PolicyModel2D(modes1=(3, 3), modes2=(3, 3), modes3=(1, 1),
                               layers=(8, 8, 8), fc_dim=16, in_dim=1)
    pparams = pol.init(jax.random.PRNGKey(2), x, re)["params"]
    pparams = pol.zero_init_params(pparams)
    pout = pol.apply({"params": pparams}, x, re)
    # zero-init => the residual actuation starts exactly at 0
    assert float(jnp.max(jnp.abs(pout))) == 0.0


def test_mfn_fouriernet():
    net = models.FourierNet(hidden_size=16, out_size=1, n_layers=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 5, 2))
    code = jax.random.normal(jax.random.PRNGKey(1), (2, 4))
    params = net.init(jax.random.PRNGKey(2), x, code)["params"]
    out = net.apply({"params": params}, x, code)
    assert out.shape == (2, 5, 5)


def test_vorticity_residual_on_exact_solution():
    """Taylor-Green-like decaying vortex: w(x,y,t) = 2k^2 nu-decay cos kx
    cos ky satisfies the unforced NS vorticity equation (advection vanishes
    by symmetry)."""
    N, T = 32, 9
    nu = 0.05
    t_interval = 0.1
    xs = jnp.linspace(0, 2 * np.pi, N, endpoint=False)
    ts = jnp.linspace(0, t_interval, T)
    X, Y, Tm = jnp.meshgrid(xs, xs, ts, indexing="ij")
    k = 1.0
    w = (jnp.cos(k * X) * jnp.cos(k * Y)
         * jnp.exp(-2 * k ** 2 * nu * Tm))[None]
    res = pde_losses.fdm_ns_vorticity(w, v=jnp.asarray([nu]),
                                      t_interval=t_interval)
    rel = float(jnp.linalg.norm(res) / jnp.linalg.norm(w))
    assert rel < 5e-3  # central-difference-in-time truncation error


def test_burgers_residual_zero_for_constant():
    u = jnp.ones((2, 8, 16))
    res = pde_losses.fdm_burgers(u, v=0.01)
    assert float(jnp.max(jnp.abs(res))) < 1e-10


def test_darcy_residual_runs():
    a = jnp.ones((2, 16, 16))
    u = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16))
    res = pde_losses.fdm_darcy(u, a)
    assert res.shape == (2, 12, 12)
    loss = pde_losses.darcy_loss(u, a)
    assert jnp.isfinite(loss)


def test_grf_and_solver():
    key = jax.random.PRNGKey(0)
    w0 = gaussian_rf_2d(key, 32, batch=2)
    assert w0.shape == (2, 32, 32)
    assert abs(float(w0.mean())) < 1.0
    traj = ns_vorticity_rollout(w0, None, visc=1e-2, dt=1e-3, n_steps=20,
                                record_every=10)
    assert traj.shape == (2, 32, 32, 2)
    assert bool(jnp.all(jnp.isfinite(traj)))
    # viscosity dissipates enstrophy in unforced flow
    assert float(jnp.sum(traj[..., -1] ** 2)) < float(jnp.sum(w0 ** 2))


def test_kf_dataset_generate_and_train():
    ds = KFDataset.generate(jax.random.PRNGKey(0), n_traj=6, S=16, T=5,
                            re=40.0)
    u, a, re = ds.arrays()
    assert u.shape == (6, 16, 16, 5)
    assert a.shape == (6, 16, 16, 5, 4)
    assert re.shape == (6,)
    np.testing.assert_allclose(np.asarray(a[..., 0, 3]), np.asarray(u[..., 0]),
                               atol=1e-5)

    model = models.PINObserver2d(modes1=(3, 3), modes2=(3, 3),
                                 modes3=(2, 2), layers=(8, 8, 8), fc_dim=16)
    params, hist = train_ns(model, (u, a, re), iterations=12, batch_size=2,
                            log_interval=6, verbose=False)
    assert np.isfinite(hist["total"]).all()
    assert hist["total"][-1] < hist["total"][0] * 2  # sane trajectory
    err = eval_ns(model, params, (u, a, re), batch_size=2)
    assert np.isfinite(err)


def test_train_ns_grad_accumulation_matches_full_batch():
    """accum_steps=k must reproduce the full-batch trajectory: the mean of
    k micro-batch gradients equals the batch gradient (per-sample-mean
    losses), so parameters after N iters agree to fp tolerance.  This is
    the mechanism that fits the reference's batch-4 pretrain budget
    (configs/pino-observer-pretrain-1s.yaml:36) in single-chip HBM."""
    ds = KFDataset.generate(jax.random.PRNGKey(3), n_traj=4, S=8, T=5,
                            re=40.0)
    data = ds.arrays()
    model = models.PINObserver2d(modes1=(2, 2), modes2=(2, 2),
                                 modes3=(2, 2), layers=(4, 4), fc_dim=8)
    kw = dict(iterations=4, batch_size=4, log_interval=4, verbose=False,
              rng=jax.random.PRNGKey(5))
    p1, h1 = train_ns(model, data, accum_steps=1, **kw)
    p2, h2 = train_ns(model, data, accum_steps=2, **kw)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(h1["total"], h2["total"], rtol=1e-4)
    with pytest.raises(ValueError):
        train_ns(model, data, accum_steps=3, **kw)


@pytest.mark.slow
def test_pino_remat_matches_plain():
    """remat=True must be numerically identical (same params, same out)
    and reduce nothing but memory.  Slow: opt-in memory knob, exercised by
    the full-budget pretrain itself."""
    import jax
    from pde_policylearning_tpu.models.pino import PINObserver2d
    kw = dict(modes1=[3] * 2, modes2=[3] * 2, modes3=[2] * 2,
              layers=[8, 8, 8], fc_dim=16, in_dim=4)
    a = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 5, 4))
    re = jnp.full((2,), 100.0)
    plain = PINObserver2d(**kw)
    rem = PINObserver2d(remat=True, **kw)
    params = plain.init(jax.random.PRNGKey(1), a, re)["params"]
    o1 = plain.apply({"params": params}, a, re)
    o2 = rem.apply({"params": params}, a, re)  # same param tree
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=1e-6)
    g = jax.grad(lambda p: jnp.sum(
        rem.apply({"params": p}, a, re) ** 2))(params)
    assert all(bool(jnp.isfinite(l).all()) for l in jax.tree.leaves(g))


def test_grf_matches_reference_amplitude():
    """GaussianRF parity: the 2-D eigenvalue scale is size**2 (GaussianRF
    dim=2, DINo/data_pdes.py:176) and torch's complex randn has unit TOTAL
    variance, so band power must follow size**4 * 2 * sigma**2 *
    (4 pi^2 k^2 + tau^2)^-alpha / size^4(ifft) independent of resolution.
    Regression for the round-2 `size * sqrt(2)` transcription that made
    every sampled IC ~1/size of the intended amplitude (degenerate
    KF datasets: all trajectories collapsed onto the same forced
    response)."""
    alpha, tau = 2.5, 7.0
    sigma = tau ** (0.5 * (2 * alpha - 2.0))
    for S in (32, 64):
        u = np.asarray(gaussian_rf_2d(jax.random.PRNGKey(0), S, 256,
                                      alpha=alpha, tau=tau))
        power = (np.abs(np.fft.fft2(u, axes=(1, 2))) ** 2).mean(0)
        k = np.fft.fftfreq(S, d=1.0 / S)
        k2 = k[:, None] ** 2 + k[None, :] ** 2
        # E|fft(Re ifft(eig*coeff))|^2 = eig^2/2 (the real part halves the
        # power; identical in the torch reference, verified by direct A/B)
        expect = (S ** 2 * np.sqrt(2.0) * sigma
                  * (4 * np.pi ** 2 * k2 + tau ** 2) ** (-alpha / 2)) ** 2 / 2
        expect[0, 0] = 0.0
        band = np.abs(np.sqrt(k2) - 2.0) < 0.5
        ratio = power[band].mean() / expect[band].mean()
        assert 0.8 < ratio < 1.25, (S, ratio)
        # resolution-independent sample amplitude
        assert 0.1 < u.std() < 0.35, (S, u.std())


def test_kf_data_satisfies_pino_residual():
    """Generated Kolmogorov-flow data must satisfy the PINO residual loss
    it is trained against: fdm_ns_vorticity uses the [0, 2pi)^2 convention
    (derivative i*k, viscous nu*k^2 — pino_utils/losses.py:71-107), so the
    generator must too.  Regression for the mixed-convention solver
    (viscosity carried a (2pi)^2 factor the advection lacked: 'Re 400'
    data was effectively Re ~ 10, and loss_f was O(1) even on clean
    data)."""
    from pde_policylearning_tpu.data import generate_kolmogorov_data
    from pde_policylearning_tpu.ops.pde_losses import get_forcing, \
        pino_loss_3d
    S, T = 32, 9
    traj = generate_kolmogorov_data(jax.random.PRNGKey(0), 2, S, T,
                                    visc=1.0 / 40, t_interval=0.5,
                                    substeps=64)
    traj = np.asarray(traj)
    assert np.isfinite(traj).all()
    ic, lf = pino_loss_3d(jnp.asarray(traj), jnp.asarray(traj[..., 0]),
                          get_forcing(S), 1.0 / 40, 0.5)
    assert float(ic) < 1e-6
    assert float(lf) < 0.05, float(lf)
    # distinct ICs -> distinct trajectories (chaotic separation)
    d = np.abs(traj[0, ..., -1] - traj[1, ..., -1]).max()
    scale = np.abs(traj[0, ..., -1]).max()
    assert d > 0.1 * scale, (d, scale)


def test_fdm_ns_vorticity_dft_matches_fft():
    """The FFT-free DFT-matmul residual path (TPU default: XLA's TPU FFT
    is ~30x under roofline, NOTES_r2) must match the jnp.fft reference
    path, including Nyquist rows, and differentiate identically."""
    from pde_policylearning_tpu.ops.pde_losses import (
        fdm_ns_vorticity, _fdm_ns_vorticity_dft)
    w = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 5))
    a = np.asarray(fdm_ns_vorticity(w, 1.0 / 40, 1.0, backend="fft"))
    b = np.asarray(_fdm_ns_vorticity_dft(w, 1.0 / 40, 1.0))
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-8 * np.abs(a).max())

    def loss_fft(w):
        return jnp.sum(fdm_ns_vorticity(w, 1.0 / 40, 1.0,
                                        backend="fft") ** 2)

    def loss_dft(w):
        return jnp.sum(_fdm_ns_vorticity_dft(w, 1.0 / 40, 1.0) ** 2)

    ga = np.asarray(jax.grad(loss_fft)(w))
    gb = np.asarray(jax.grad(loss_dft)(w))
    np.testing.assert_allclose(ga, gb, rtol=0, atol=1e-6 * np.abs(ga).max())
