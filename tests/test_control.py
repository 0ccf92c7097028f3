"""Closed-loop control tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pde_policylearning_tpu import models
from pde_policylearning_tpu.control import make_policy, run_closed_loop
from pde_policylearning_tpu.envs import NSControlEnv
from pde_policylearning_tpu.ops.normalization import NormalizerGivenMeanStd


@pytest.fixture()
def env():
    return NSControlEnv(Nx=8, Ny=17, Nz=8, detect_plane=3,
                        dtype=jnp.float64, noise_scale=0.02, seed=1)


@pytest.mark.parametrize("policy_name", ["gt", "rand", "unmanipulated"])
def test_basic_policies(env, policy_name):
    # rand actuation has positive mean (compute_opposition.m: 0.01*rand), so
    # it injects net wall mass flux; keep it small to stay within the
    # divergence guard on this coarse grid
    policy = make_policy(policy_name, env.grid, detect_plane=3,
                         rand_scale=0.01)
    res = run_closed_loop(env, policy, n_steps=6, log_interval=3,
                          verbose=False)
    s = res["series"]
    assert len(s["drag_reduction/1_shear_stress"]) == 6
    assert np.isfinite(s["drag_reduction/4_4_speed_norm"]).all()
    assert "drag_reduction_relative/1_shear_stress" in s


def test_observer_policy(env):
    model = models.FNO2dObserver(modes1=3, modes2=3, width=8)
    x = jnp.zeros((1, 8, 8, 1))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    p_norm = NormalizerGivenMeanStd(jnp.zeros(()), jnp.ones(()))
    # decode scale keeps the untrained model's random actuation small
    v_norm = NormalizerGivenMeanStd(jnp.zeros(()), jnp.asarray(1e-3))
    policy = make_policy("fno", env.grid, model=model, params=params,
                         p_norm=p_norm, v_norm=v_norm)
    res = run_closed_loop(env, policy, n_steps=4, log_interval=4,
                          verbose=False, collect_planes=True)
    assert res["opV2"].shape == (4, 8, 8)
    assert np.isfinite(res["opV2"]).all()


def test_optimal_observer_policy(env):
    model = models.FNO2dObserver(modes1=3, modes2=3, width=8)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 8, 8, 1)))["params"]
    norm = NormalizerGivenMeanStd(jnp.zeros(()), jnp.ones(()))
    policy = make_policy("optimal-observer", env.grid, detect_plane=3,
                         model=model, params=params, bound_v_norm=norm,
                         opt_steps=3)
    res = run_closed_loop(env, policy, n_steps=3, log_interval=3,
                          verbose=False, collect_planes=True)
    # the action must be mean-subtracted (run_control.py:223)
    assert abs(res["opV2"][-1].mean()) < 1e-8
    assert np.isfinite(res["opV2"]).all()


def test_optimal_policy_observer(env):
    """Online policy-model adaptation through a frozen full-field observer
    (run_control.py:162-185)."""
    from pde_policylearning_tpu.control import make_optimal_policy_observer

    obs = models.PINObserverFullField(
        plane_num=2, modes1=(2, 2), modes2=(2, 2), modes3=(1, 1),
        layers=(8, 8, 8), fc_dim=8, in_dim=1)
    x0 = jnp.zeros((1, 8, 8, 1, 1))
    re0 = jnp.ones((1,))
    obs_params = obs.init(jax.random.PRNGKey(0), x0, re0)["params"]
    pol = models.PolicyModel2D(
        modes1=(2, 2), modes2=(2, 2), modes3=(1, 1), layers=(8, 8, 8),
        fc_dim=8, in_dim=1)
    pol_params = pol.init(jax.random.PRNGKey(1), x0, re0)["params"]
    pol_params = pol.zero_init_params(pol_params)

    policy = make_optimal_policy_observer(
        env.grid, observer_model=obs, observer_params=obs_params,
        policy_model=pol, policy_params=pol_params, detect_plane=3,
        opt_steps=2)
    res = run_closed_loop(env, policy, n_steps=3, log_interval=3,
                          verbose=False, collect_planes=True)
    assert np.isfinite(res["opV2"]).all()
    assert res["opV2"].shape == (3, 8, 8)


def test_fullfield_optimal_observer(env):
    """Inner Adam directly on opV2 through a frozen full-field observer
    (run_control.py:186-224)."""
    from pde_policylearning_tpu.control import \
        make_fullfield_optimal_observer

    obs = models.PINObserverFullField(
        plane_num=2, modes1=(2, 2), modes2=(2, 2), modes3=(1, 1),
        layers=(8, 8, 8), fc_dim=8, in_dim=1)
    x0 = jnp.zeros((1, 8, 8, 1, 1))
    re0 = jnp.ones((1,))
    obs_params = obs.init(jax.random.PRNGKey(0), x0, re0)["params"]
    norm = NormalizerGivenMeanStd(jnp.zeros(()), jnp.ones(()))
    policy = make_fullfield_optimal_observer(
        env.grid, observer_model=obs, observer_params=obs_params,
        bound_v_norm=norm, detect_plane=3, opt_steps=2)
    res = run_closed_loop(env, policy, n_steps=3, log_interval=3,
                          verbose=False, collect_planes=True)
    assert np.isfinite(res["opV2"]).all()
    assert res["opV2"].shape == (3, 8, 8)
    # the action must be mean-subtracted (run_control.py:223)
    assert abs(res["opV2"][-1].mean()) < 1e-8


def _p2_policy(state, p2, key):
    """A policy whose actuation depends on the observed wall pressure, so
    the initial p2 (cached or recomputed) is visible in the series."""
    v = 1e-3 * jnp.reshape(p2, (8, 8)).astype(state.U.dtype)
    v = v - jnp.mean(v)
    return jnp.zeros_like(v), v


def test_p2_cache_hit_and_miss():
    """The identity-keyed _p2_cache (loop.py) must be USED on a hit and
    DROPPED when env.state is a different object."""
    kw = dict(Nx=8, Ny=17, Nz=8, detect_plane=3, dtype=jnp.float64,
              noise_scale=0.02, seed=1)
    run = dict(n_steps=4, log_interval=4, verbose=False,
               collect_planes=True)

    # the FIRST action is computed from the initial p2, so it exposes
    # whether the cached or the recomputed pressure was consumed
    base = run_closed_loop(NSControlEnv(**kw), _p2_policy, **run)["opV2"][0]

    # HIT: a poisoned cache keyed on the current state object must be
    # consumed (first action doubles with the 2x-poisoned p2)
    env = NSControlEnv(**kw)
    from pde_policylearning_tpu.control.loop import _boundary_pressures_jit
    _, p2 = _boundary_pressures_jit(env.grid, env.state)
    env._p2_cache = (env.state, p2 * 2.0)
    poisoned = run_closed_loop(env, _p2_policy, **run)["opV2"][0]
    np.testing.assert_allclose(poisoned, 2.0 * base, rtol=1e-12)

    # MISS: same poisoned p2, but state replaced by an equal-valued NEW
    # object -> cache must be bypassed and recomputed (action == baseline)
    env = NSControlEnv(**kw)
    env._p2_cache = (env.state, p2 * 2.0)
    env.state = jax.tree_util.tree_map(lambda x: x, env.state)
    missed = run_closed_loop(env, _p2_policy, **run)["opV2"][0]
    np.testing.assert_allclose(missed, base, rtol=0, atol=0)
    # and the stale entry was released before recompute (ADVICE r4)
    assert env._p2_cache is not None and env._p2_cache[0] is env.state


def test_p2_cache_back_to_back_consistency():
    """Two back-to-back run_closed_loop calls (second one hits the cache)
    must produce the same series as one uninterrupted run."""
    kw = dict(Nx=8, Ny=17, Nz=8, detect_plane=3, dtype=jnp.float64,
              noise_scale=0.02, seed=1)
    key = "drag_reduction/1_shear_stress"
    env1 = NSControlEnv(**kw)
    s1a = run_closed_loop(env1, _p2_policy, n_steps=3, log_interval=3,
                          verbose=False)["series"][key]
    assert env1._p2_cache is not None \
        and env1._p2_cache[0] is env1.state
    s1b = run_closed_loop(env1, _p2_policy, n_steps=3, log_interval=3,
                          verbose=False)["series"][key]
    env2 = NSControlEnv(**kw)
    s2 = run_closed_loop(env2, _p2_policy, n_steps=6, log_interval=3,
                         verbose=False)["series"][key]
    np.testing.assert_allclose(np.concatenate([s1a, s1b]), s2,
                               rtol=0, atol=0)


def test_divergence_guard():
    env = NSControlEnv(Nx=8, Ny=17, Nz=8, detect_plane=3,
                       dtype=jnp.float64)
    # actuate insanely hard to blow up the solver

    def bad_policy(state, p2, key):
        big = 1e4 * jnp.ones((8, 8), state.U.dtype)
        return big, -big

    with pytest.raises(RuntimeError, match="diverged"):
        run_closed_loop(env, bad_policy, n_steps=40, log_interval=10,
                        verbose=False)


def test_transformer_observer_policy(env):
    """The transformer policy consumes a (B, T, H, W, 1) sequence and
    actuates on its LAST timestep prediction (run_control.py transformer
    branch)."""
    model = models.SimpleTransformer(n_hidden=16, n_head=2,
                                     attention_type="fourier",
                                     freq_dim=8, fourier_modes=3)
    x = jnp.zeros((1, 2, 8, 8, 1))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    p_norm = NormalizerGivenMeanStd(jnp.zeros(()), jnp.ones(()))
    v_norm = NormalizerGivenMeanStd(jnp.zeros(()), jnp.asarray(1e-3))
    policy = make_policy("transformer", env.grid, model=model,
                         params=params, p_norm=p_norm, v_norm=v_norm,
                         model_timestep=2, action_scale=0.3,
                         action_clip=0.01)
    res = run_closed_loop(env, policy, n_steps=4, log_interval=4,
                          verbose=False, collect_planes=True)
    assert np.isfinite(res["opV2"]).all()
    # zero-net-flux: the actuation plane is mean-subtracted
    assert abs(res["opV2"][-1].mean()) < 1e-8
