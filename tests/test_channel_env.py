"""Channel-flow DNS env tests.

Strategy (SURVEY.md §4: add what the reference lacks):
1. an independent scalar-loop NumPy oracle of the staggered-grid momentum
   RHS, checked against the vectorized JAX version on a tiny grid;
2. physics invariants: projection kills divergence, laminar Poiseuille flow
   is (near-)steady, the mass-flow correction holds bulk velocity;
3. API/contract tests of NSControlEnv (info dict schema, step_n == step).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pde_policylearning_tpu.envs import channel_flow as cf
from pde_policylearning_tpu.envs import NSControlEnv


def small_grid(Nx=8, Ny=17, Nz=8, **kw):
    return cf.make_channel_grid(Nx=Nx, Ny=Ny, Nz=Nz, dtype=jnp.float64, **kw)


# ---------------------------------------------------------------------------
# scalar-loop oracle (written straight from the staggered FV discretization)
# ---------------------------------------------------------------------------

def rhs_oracle(grid, U, V, W, dPdx):
    U, V, W = map(np.asarray, (U, V, W))
    Nx, Ny, Nz = grid.Nx, grid.Ny, grid.Nz
    dx, dz, nu = grid.dx, grid.dz, grid.nu
    y = np.asarray(grid.y)
    ym = np.asarray(grid.ym)
    yg = np.asarray(grid.yg)
    Fu = np.zeros_like(U)
    Fv = np.zeros_like(V)
    Fw = np.zeros_like(W)
    xp = lambda i: (i + 1) % Nx
    xm = lambda i: (i - 1) % Nx
    zp = lambda k: (k + 1) % Nz
    zm = lambda k: (k - 1) % Nz

    UU = np.zeros_like(U)
    UW = np.zeros_like(U)
    WW = np.zeros_like(W)
    UV = np.zeros((Nx, Ny, Nz))
    VW = np.zeros((Nx, Ny, Nz))
    VV = np.zeros((Nx, Ny - 1, Nz))
    for i in range(Nx):
        for j in range(Ny + 1):
            for k in range(Nz):
                UU[i, j, k] = (0.5 * (U[i, j, k] + U[xp(i), j, k])) ** 2
                UW[i, j, k] = (0.5 * (W[i, j, k] + W[xm(i), j, k])
                               * 0.5 * (U[i, j, k] + U[i, j, zm(k)]))
                WW[i, j, k] = (0.5 * (W[i, j, k] + W[i, j, zp(k)])) ** 2
    for i in range(Nx):
        for j in range(Ny):
            for k in range(Nz):
                UV[i, j, k] = (0.5 * (V[i, j, k] + V[xm(i), j, k])
                               * 0.5 * (U[i, j, k] + U[i, j + 1, k]))
                VW[i, j, k] = (0.5 * (V[i, j, k] + V[i, j, zm(k)])
                               * 0.5 * (W[i, j, k] + W[i, j + 1, k]))
    for i in range(Nx):
        for j in range(Ny - 1):
            for k in range(Nz):
                VV[i, j, k] = (0.5 * (V[i, j, k] + V[i, j + 1, k])) ** 2

    for i in range(Nx):
        for j in range(Ny + 1):
            for k in range(Nz):
                f = -(UU[i, j, k] - UU[xm(i), j, k]) / dx
                f -= (UW[i, j, zp(k)] - UW[i, j, k]) / dz
                f += nu * (U[xp(i), j, k] - 2 * U[i, j, k]
                           + U[xm(i), j, k]) / dx ** 2
                f += nu * (U[i, j, zp(k)] - 2 * U[i, j, k]
                           + U[i, j, zm(k)]) / dz ** 2
                if 1 <= j <= Ny - 1:
                    f -= (UV[i, j, k] - UV[i, j - 1, k]) / (y[j] - y[j - 1])
                    f += nu * ((U[i, j + 1, k] - U[i, j, k])
                               / (yg[j + 1] - yg[j])
                               - (U[i, j, k] - U[i, j - 1, k])
                               / (yg[j] - yg[j - 1])) / (y[j] - y[j - 1])
                Fu[i, j, k] = f + dPdx / 2

                g = -(UW[xp(i), j, k] - UW[i, j, k]) / dx
                g -= (WW[i, j, k] - WW[i, j, zm(k)]) / dz
                g += nu * (W[xp(i), j, k] - 2 * W[i, j, k]
                           + W[xm(i), j, k]) / dx ** 2
                g += nu * (W[i, j, zp(k)] - 2 * W[i, j, k]
                           + W[i, j, zm(k)]) / dz ** 2
                if 1 <= j <= Ny - 1:
                    g -= (VW[i, j, k] - VW[i, j - 1, k]) / (y[j] - y[j - 1])
                    g += nu * ((W[i, j + 1, k] - W[i, j, k])
                               / (yg[j + 1] - yg[j])
                               - (W[i, j, k] - W[i, j - 1, k])
                               / (yg[j] - yg[j - 1])) / (y[j] - y[j - 1])
                Fw[i, j, k] = g

    for i in range(Nx):
        for j in range(Ny):
            for k in range(Nz):
                f = -(UV[xp(i), j, k] - UV[i, j, k]) / dx
                f -= (VW[i, j, zp(k)] - VW[i, j, k]) / dz
                f += nu * (V[xp(i), j, k] - 2 * V[i, j, k]
                           + V[xm(i), j, k]) / dx ** 2
                f += nu * (V[i, j, zp(k)] - 2 * V[i, j, k]
                           + V[i, j, zm(k)]) / dz ** 2
                if 1 <= j <= Ny - 2:
                    f -= (VV[i, j, k] - VV[i, j - 1, k]) / (ym[j] - ym[j - 1])
                    f += nu * ((V[i, j + 1, k] - V[i, j, k])
                               / (y[j + 1] - y[j])
                               - (V[i, j, k] - V[i, j - 1, k])
                               / (y[j] - y[j - 1])) / (ym[j] - ym[j - 1])
                Fv[i, j, k] = f
    return Fu, Fv, Fw


def random_state(grid, key=0, scale=0.1):
    rng = np.random.default_rng(key)
    U = rng.normal(0, scale, (grid.Nx, grid.Ny + 1, grid.Nz))
    V = rng.normal(0, scale, (grid.Nx, grid.Ny, grid.Nz))
    W = rng.normal(0, scale, (grid.Nx, grid.Ny + 1, grid.Nz))
    return (jnp.asarray(U), jnp.asarray(V), jnp.asarray(W))


def test_rhs_matches_loop_oracle():
    grid = small_grid()
    U, V, W = random_state(grid)
    dPdx = 0.003
    Fu, Fv, Fw = cf.compute_rhs(grid, U, V, W, dPdx)
    Fu_o, Fv_o, Fw_o = rhs_oracle(grid, U, V, W, dPdx)
    # ghost rows (0, -1) of Fu/Fw carry y-term-free values in both versions
    np.testing.assert_allclose(np.asarray(Fu), Fu_o, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(Fv), Fv_o, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(Fw), Fw_o, rtol=1e-10, atol=1e-12)


def test_poisson_solver_residual():
    grid = small_grid()
    rng = np.random.default_rng(1)
    rhs = jnp.asarray(rng.normal(size=(grid.Nx, grid.Ny - 1, grid.Nz)))
    p = cf.poisson_solve(grid, rhs)
    # apply the operator spectrally and compare
    rhs_hat = jnp.fft.fft(jnp.fft.rfft(rhs, axis=2), axis=0)
    p_hat = jnp.fft.fft(jnp.fft.rfft(p, axis=2), axis=0)
    Nzr = grid.Nz // 2 + 1
    kk = grid.kxx[:, None, None] + grid.kzz[None, None, :Nzr]
    applied = cf._tridiag_apply(grid, kk, p_hat)
    applied = applied.at[0, 0, 0].add(0.5 * grid.DD_diag[0] * p_hat[0, 0, 0])
    np.testing.assert_allclose(np.asarray(applied), np.asarray(rhs_hat),
                               rtol=1e-8, atol=1e-8)


def test_projection_kills_divergence():
    grid = small_grid()
    U, V, W = random_state(grid)
    U, V, W = cf.apply_boundary_condition(
        U, V, W, jnp.zeros((grid.Nx, grid.Nz)), jnp.zeros((grid.Nx, grid.Nz)))
    def fluct(d):
        # the horizontally-averaged (kx=kz=0) mode lives in the null space of
        # the Neumann Poisson operator (regularized via the 1.5*D[0,0] hack,
        # control_env.py:598-599) and is not removable by projection; the
        # physical solver controls it through the wall-flux BCs instead.
        return d - jnp.mean(d, axis=(0, 2), keepdims=True)

    div0 = float(jnp.max(jnp.abs(fluct(cf.divergence(grid, U, V, W)))))
    U2, V2, W2 = cf.projection_step(grid, U, V, W)
    div1 = float(jnp.max(jnp.abs(fluct(cf.divergence(grid, U2, V2, W2)))))
    assert div1 < 1e-6 * div0


def test_laminar_flow_is_steady():
    grid = small_grid(Ny=33)
    state = cf.init_state(grid, dPdx=cf.DEFAULT_DPDX)
    zeros = jnp.zeros((grid.Nx, grid.Nz), jnp.float64)
    U0 = np.asarray(state.U)
    for _ in range(10):
        state = cf.rk3_step(grid, state, zeros, zeros)
    drift = float(jnp.max(jnp.abs(state.U - U0)))
    scale = float(jnp.max(jnp.abs(state.U)))
    # the antisymmetric ghost BC is only O(h^2)-consistent with the parabola
    # at the wall, so a small steady residual remains (same scheme as the
    # reference); assert it stays tiny and does not grow
    assert drift < 1e-4 * scale
    for _ in range(10):
        state = cf.rk3_step(grid, state, zeros, zeros)
    drift20 = float(jnp.max(jnp.abs(state.U - U0)))
    assert drift20 < 4 * drift + 1e-12


def test_mass_flow_held_constant():
    grid = small_grid()
    state = cf.init_state(grid, key=jax.random.PRNGKey(0), noise=0.01)
    target = float(state.meanU0)
    zeros = jnp.zeros((grid.Nx, grid.Nz), jnp.float64)
    for _ in range(5):
        state = cf.rk3_step(grid, state, zeros, zeros)
    now = float(cf.calculate_mean_u(grid, state.U))
    assert abs(now - target) < 1e-4 * max(abs(target), 1e-8)


def test_refinement_recovers_f32_accuracy():
    g64 = small_grid()
    g32 = cf.make_channel_grid(Nx=8, Ny=17, Nz=8, dtype=jnp.float32,
                               refine_steps=2)
    rng = np.random.default_rng(2)
    rhs = rng.normal(size=(8, 16, 8))
    p64 = np.asarray(cf.poisson_solve(g64, jnp.asarray(rhs)))
    p32 = np.asarray(cf.poisson_solve(g32, jnp.asarray(rhs, np.float32)))
    rel = np.linalg.norm(p32 - p64) / np.linalg.norm(p64)
    assert rel < 1e-5


def test_boundary_pressure_fast_path_matches_full_solve():
    grid = small_grid()
    state = cf.init_state(grid, key=jax.random.PRNGKey(5), noise=0.02)
    P = cf.compute_pressure(grid, state)
    p1_full = -0.5 * (P[:, 0, :] + P[:, 1, :])
    p2_full = -0.5 * (P[:, -1, :] + P[:, -2, :])
    p1, p2 = cf.boundary_pressures(grid, state)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p1_full),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p2_full),
                               rtol=1e-9, atol=1e-12)


def test_env_contract():
    env = NSControlEnv(Nx=8, Ny=17, Nz=8, detect_plane=3, dtype=jnp.float64,
                       noise_scale=0.01)
    opV1, opV2 = env.gt_control()
    assert opV1.shape == (8, 8)
    p2, div, done, info = env.step(opV1, opV2)
    assert p2.shape == (8, 8)
    for key in ["drag_reduction/1_shear_stress",
                "drag_reduction/2_1_mass_flow",
                "drag_reduction/3_3_dPdx_reverse_cal",
                "drag_reduction/4_1_-|divergence|",
                "drag_reduction/4_4_speed_norm",
                "drag_reduction_relative/1_shear_stress"]:
        assert key in info, key
        assert np.isfinite(info[key]), key
    assert done is False

    rnd = env.rand_control()
    assert rnd.shape == (8, 8) and rnd.max() <= 0.01


def test_step_n_matches_step():
    env1 = NSControlEnv(Nx=8, Ny=17, Nz=8, dtype=jnp.float64,
                        noise_scale=0.01, seed=3)
    env2 = NSControlEnv(Nx=8, Ny=17, Nz=8, dtype=jnp.float64,
                        noise_scale=0.01, seed=3)
    ops = np.zeros((4, 8, 8))
    for i in range(4):
        p2_single, _, _, info_single = env1.step(ops[i], ops[i])
    p2_seq, infos = env2.step_n(ops, ops)
    np.testing.assert_allclose(p2_seq[-1], p2_single, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(
        infos["drag_reduction/2_1_mass_flow"][-1],
        info_single["drag_reduction/2_1_mass_flow"], rtol=1e-9)


@pytest.mark.slow
def test_f32_tracks_f64():
    """North-star parity (BASELINE.md): the f32 TPU-path env must stay
    within rel-L2 1e-3 of the f64 reference-precision solve.  Measured:
    ~3e-7 (U) / ~6e-5 (wall pressures) over 50 steps; asserted with
    margin."""
    g64 = cf.make_channel_grid(Nx=8, Ny=17, Nz=8, dtype=jnp.float64)
    g32 = cf.make_channel_grid(Nx=8, Ny=17, Nz=8, dtype=jnp.float32)
    s64 = cf.init_state(g64, key=jax.random.PRNGKey(0), noise=0.05)
    s32 = cf.ChannelState(
        U=s64.U.astype(jnp.float32), V=s64.V.astype(jnp.float32),
        W=s64.W.astype(jnp.float32), dPdx=s64.dPdx.astype(jnp.float32),
        meanU0=s64.meanU0.astype(jnp.float32))
    z64 = jnp.zeros((8, 8))
    z32 = jnp.zeros((8, 8), jnp.float32)
    a, b = s64, s32
    for _ in range(10):
        a = cf.rk3_step(g64, a, z64, z64)
        b = cf.rk3_step(g32, b, z32, z32)
    rel = float(jnp.linalg.norm(a.U - b.U.astype(jnp.float64))
                / jnp.linalg.norm(a.U))
    assert rel < 1e-4
    p64 = cf.boundary_pressures(g64, a)[1]
    p32 = cf.boundary_pressures(g32, b)[1]
    prel = float(jnp.linalg.norm(p64 - p32.astype(jnp.float64))
                 / jnp.linalg.norm(p64))
    assert prel < 1e-3


def test_vmapped_step_matches_single():
    """Batched (vmap) stepping must agree with per-env stepping — guards
    the complex-arithmetic-under-vmap backend bug class (the solve path is
    real-stacked for this reason, see channel_flow poisson_solve)."""
    grid = small_grid()
    states = cf.init_batched_states(grid, 3, jax.random.PRNGKey(0),
                                    noise=0.02)
    z = jnp.zeros((3, 8, 8))
    stepped = jax.vmap(lambda s, o: cf.rk3_step(grid, s, o, o))(states, z)
    for lane in range(3):
        s1 = jax.tree.map(lambda a: a[lane], states)
        t1 = cf.rk3_step(grid, s1, z[0], z[0])
        np.testing.assert_allclose(np.asarray(stepped.U[lane]),
                                   np.asarray(t1.U), rtol=1e-9, atol=1e-11)
        np.testing.assert_allclose(float(stepped.dPdx[lane]),
                                   float(t1.dPdx), rtol=1e-8)


def test_batched_rollout():
    grid = small_grid()
    states = cf.init_batched_states(grid, 2, jax.random.PRNGKey(1),
                                    noise=0.02)
    s2, outs = cf.batched_rollout(grid, states, 4, detect_plane=3,
                                  policy="gt")
    p2s = outs[0]
    assert p2s.shape == (2, 4, 8, 8)
    assert bool(jnp.isfinite(s2.U).all())


def test_dump_load_roundtrip(tmp_path):
    env = NSControlEnv(Nx=8, Ny=17, Nz=8, dtype=jnp.float64, noise_scale=0.01)
    path = str(tmp_path / "state.npz")
    env.dump_state(path)
    env2 = NSControlEnv(Nx=8, Ny=17, Nz=8, dtype=jnp.float64)
    env2.load_state(path)
    np.testing.assert_allclose(env2.U, env.U)
    np.testing.assert_allclose(env2.V, env.V)


def test_pde_loss_zero_for_matching_fields():
    env = NSControlEnv(Nx=8, Ny=17, Nz=8, dtype=jnp.float64, noise_scale=0.01)
    loss = float(env.pde_loss(env.U, env.V, env.V, env.W, env.dPdx))
    assert loss == 0.0
    V2 = env.V + 0.01
    assert float(env.pde_loss(env.U, env.V, V2, env.W, env.dPdx)) > 0


def test_developed_turbulence_snapshot():
    """The packaged developed-turbulence IC (our channel180_minchan.mat
    equivalent, control_env.py:149-180): statistics must sit in the
    Re_tau~180 turbulent band, and the DNS must STAY turbulent from it."""
    from pde_policylearning_tpu.envs.control_env import default_snapshot_path
    path = default_snapshot_path()
    assert path is not None, "snapshot missing (scripts/spinup_turbulence.py)"
    data = np.load(path)
    utau2 = cf.DEFAULT_DPDX

    grid = cf.make_channel_grid(dtype=jnp.float32)
    st = cf.init_state(grid, U=data["U"], V=data["V"], W=data["W"],
                       dPdx=float(data["dPdx"]), dtype=jnp.float32)
    # turbulent operating point: bulk ~0.89 (Re_b ~ 2900), not laminar 3.55
    bulk = float(st.meanU0)
    assert 0.7 < bulk < 1.1
    # wall shear within 50% of utau^2 and well above the laminar value
    tau = float(cf.shear_stress(grid, st))
    assert 0.5 * utau2 < tau < 1.5 * utau2
    assert tau > 2.0 * 3 * grid.nu * bulk
    # fluctuations present (turbulent, not mean-flow-only): rms of V
    assert float(jnp.std(st.V)) > 0.2 * np.sqrt(utau2)

    # stays turbulent over a short horizon
    st2, stats = cf.spinup_chunk(grid, st, 100)
    s = np.asarray(stats)
    assert np.isfinite(s).all()
    assert s[-30:, :2].mean() > 2.0 * 3 * grid.nu * bulk
