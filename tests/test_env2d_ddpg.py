"""2-D env + DDPG tests."""
import jax.numpy as jnp
import numpy as np
import pytest

from pde_policylearning_tpu.control.ddpg import (DDPGAgent, PendulumEnv,
                                                 ReplayMemory,
                                                 train_pendulum)
from pde_policylearning_tpu.envs.channel2d import NSControlEnv2D


def test_env2d_step_contract():
    env = NSControlEnv2D(Re=100.0, seed=0)
    p_top, div, done, info = env.step(None)
    assert p_top.shape == (41,)
    for k in ["drag_reduction/1_shear_stress",
              "drag_reduction/2_1_mass_flow",
              "drag_reduction/4_2_speed_norm"]:
        assert np.isfinite(info[k]), k
    assert done is False
    # second step adds relative metrics
    _, _, _, info2 = env.step(None)
    assert "drag_reduction_relative/1_shear_stress" in info2


def test_env2d_actuation():
    env = NSControlEnv2D(Re=100.0, seed=1)
    env.step(None)
    bot, top = env.gt_control()
    assert bot.shape == (41,)
    p_top, div, done, info = env.step((0.1 * bot, 0.1 * top))
    assert np.isfinite(info["drag_reduction/4_2_speed_norm"])


def test_replay_memory():
    mem = ReplayMemory(10, 3, 1)
    for i in range(15):
        mem.push(np.ones(3) * i, [0.5], 1.0, np.ones(3), False)
    assert len(mem) == 10
    rng = np.random.default_rng(0)
    s, a, r, s2, d = mem.sample(rng, 4)
    assert s.shape == (4, 3) and a.shape == (4, 1)


def test_ddpg_on_channel_env():
    """DDPG wired to the DNS env through the gym adapter (beyond the
    reference, which leaves its DDPG unconnected)."""
    from pde_policylearning_tpu.control import train_ddpg_channel
    agent, returns = train_ddpg_channel(
        episodes=1, steps_per_ep=3, batch_size=2,
        env_kwargs={"Nx": 8, "Ny": 17, "Nz": 8, "detect_plane": 3,
                    "dtype": jnp.float64, "action_clip": 0.005},
        verbose=False)
    assert np.isfinite(returns).all()


def test_ddpg_learns_something():
    agent, returns = train_pendulum(episodes=3, steps_per_ep=50,
                                    batch_size=32, verbose=False)
    assert np.isfinite(returns).all()
    # update runs and produces finite losses
    mem = ReplayMemory(100, 3, 1)
    env = PendulumEnv(0)
    s = env.reset()
    rng = np.random.default_rng(0)
    for _ in range(40):
        a = agent.act(s, 0.1, rng)
        s2, r, done, _ = env.step(a)
        mem.push(s, a, r, s2, done)
        s = s2
    cl, al = agent.update(mem.sample(rng, 16))
    assert np.isfinite(cl) and np.isfinite(al)


@pytest.mark.slow
def test_ddpg_on_device_channel(monkeypatch):
    """Fully on-device DDPG loop (rollout + replay + updates in one scan)
    through the fused kernels in interpret mode — tiny budget."""
    from pde_policylearning_tpu.control.ddpg import (
        train_ddpg_channel_on_device)
    from pde_policylearning_tpu.envs import channel_flow as cf
    from pde_policylearning_tpu.envs import rk3_pallas as rk

    monkeypatch.setattr(rk, "INTERPRET", True)
    monkeypatch.setattr(cf, "RK3_BACKEND", "fused")
    ap, metrics = train_ddpg_channel_on_device(
        n_steps=3, warmup=2, buffer_size=8, batch_size=2, hidden=16,
        verbose=False)
    assert np.isfinite(metrics["shear"]).all()
    assert np.isfinite(metrics["critic_loss"]).all()


def test_ddpg_policy_contract():
    """Trained-actor closed-loop policy: zero-net-flux, clipped, (Nx,Nz)."""
    import jax
    from pde_policylearning_tpu.control.ddpg import (Actor,
                                                     make_ddpg_policy)
    actor = Actor(32 * 32, max_action=0.01, hidden=16)
    ap = actor.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, 32 * 32)))["params"]
    pol = make_ddpg_policy(ap, 32, 32, hidden=16)
    key = jax.random.PRNGKey(1)
    p2 = jax.random.normal(key, (32, 32)) * 0.01
    op1, op2 = pol(None, p2, None)
    assert op2.shape == (32, 32)
    assert float(jnp.abs(op2).max()) <= 0.01 + 1e-6
    assert abs(float(jnp.mean(op2))) < 1e-8
    assert float(jnp.abs(op1).max()) == 0.0
