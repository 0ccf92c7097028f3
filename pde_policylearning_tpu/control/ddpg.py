"""DDPG: deep deterministic policy gradient agent.

reference: libs/ddpg/agent_ddpg.py (Actor:18, Critic:32, ReplayMemory:47,
DDPGAgent.update with soft target updates:83-117) and main_ddpg.py — a
standalone actor-critic demo on Pendulum-v1, not wired to the NS env.

JAX version: jitted update step (critic TD target from target nets, actor
policy gradient, Polyak averaging); numpy ring-buffer replay.  A built-in
pendulum dynamics is provided so the demo needs no gym dependency.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax


class Actor(nn.Module):
    action_dim: int
    max_action: float = 1.0
    hidden: int = 256

    @nn.compact
    def __call__(self, s):
        x = nn.relu(nn.Dense(self.hidden)(s))
        x = nn.relu(nn.Dense(self.hidden)(x))
        return self.max_action * nn.tanh(nn.Dense(self.action_dim)(x))


class Critic(nn.Module):
    hidden: int = 256

    @nn.compact
    def __call__(self, s, a):
        x = jnp.concatenate([s, a], axis=-1)
        x = nn.relu(nn.Dense(self.hidden)(x))
        x = nn.relu(nn.Dense(self.hidden)(x))
        return nn.Dense(1)(x)


class ReplayMemory:
    """Ring buffer (agent_ddpg.py:47)."""

    def __init__(self, capacity: int, state_dim: int, action_dim: int):
        self.capacity = capacity
        self.s = np.zeros((capacity, state_dim), np.float32)
        self.a = np.zeros((capacity, action_dim), np.float32)
        self.r = np.zeros((capacity, 1), np.float32)
        self.s2 = np.zeros((capacity, state_dim), np.float32)
        self.done = np.zeros((capacity, 1), np.float32)
        self.idx = 0
        self.full = False

    def push(self, s, a, r, s2, done):
        i = self.idx
        self.s[i], self.a[i], self.r[i] = s, a, r
        self.s2[i], self.done[i] = s2, float(done)
        self.idx = (i + 1) % self.capacity
        self.full = self.full or self.idx == 0

    def __len__(self):
        return self.capacity if self.full else self.idx

    def sample(self, rng: np.random.Generator, batch: int):
        idx = rng.integers(0, len(self), batch)
        return (self.s[idx], self.a[idx], self.r[idx], self.s2[idx],
                self.done[idx])


class DDPGAgent:
    def __init__(self, state_dim: int, action_dim: int,
                 max_action: float = 1.0, gamma: float = 0.99,
                 tau: float = 0.005, actor_lr: float = 1e-4,
                 critic_lr: float = 1e-3, seed: int = 0):
        self.gamma, self.tau = gamma, tau
        self.actor = Actor(action_dim, max_action)
        self.critic = Critic()
        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        s0 = jnp.zeros((1, state_dim))
        a0 = jnp.zeros((1, action_dim))
        self.actor_params = self.actor.init(k1, s0)["params"]
        self.critic_params = self.critic.init(k2, s0, a0)["params"]
        self.target_actor = jax.tree.map(jnp.copy, self.actor_params)
        self.target_critic = jax.tree.map(jnp.copy, self.critic_params)
        self.actor_opt = optax.adam(actor_lr)
        self.critic_opt = optax.adam(critic_lr)
        self.actor_state = self.actor_opt.init(self.actor_params)
        self.critic_state = self.critic_opt.init(self.critic_params)
        self._update = self._make_update()

    def _make_update(self):
        actor, critic = self.actor, self.critic
        gamma, tau = self.gamma, self.tau
        actor_opt, critic_opt = self.actor_opt, self.critic_opt

        @jax.jit
        def update(ap, cp, ta, tc, a_state, c_state, batch):
            s, a, r, s2, done = batch
            a2 = actor.apply({"params": ta}, s2)
            q_target = r + gamma * (1 - done) * critic.apply(
                {"params": tc}, s2, a2)

            def critic_loss(cp):
                q = critic.apply({"params": cp}, s, a)
                return jnp.mean((q - jax.lax.stop_gradient(q_target)) ** 2)

            cl, gc = jax.value_and_grad(critic_loss)(cp)
            up, c_state = critic_opt.update(gc, c_state)
            cp = optax.apply_updates(cp, up)

            def actor_loss(ap):
                return -jnp.mean(critic.apply(
                    {"params": cp}, s, actor.apply({"params": ap}, s)))

            al, ga = jax.value_and_grad(actor_loss)(ap)
            up, a_state = actor_opt.update(ga, a_state)
            ap = optax.apply_updates(ap, up)

            polyak = lambda t, p: jax.tree.map(
                lambda t_, p_: (1 - tau) * t_ + tau * p_, t, p)
            return ap, cp, polyak(ta, ap), polyak(tc, cp), a_state, \
                c_state, cl, al

        return update

    def act(self, state, noise_scale: float = 0.0,
            rng: Optional[np.random.Generator] = None):
        a = self.actor.apply({"params": self.actor_params},
                             jnp.asarray(state)[None])[0]
        a = np.asarray(a)
        if noise_scale > 0 and rng is not None:
            a = a + noise_scale * rng.standard_normal(a.shape)
        return a

    def update(self, batch):
        batch = tuple(jnp.asarray(b) for b in batch)
        (self.actor_params, self.critic_params, self.target_actor,
         self.target_critic, self.actor_state, self.critic_state,
         cl, al) = self._update(
            self.actor_params, self.critic_params, self.target_actor,
            self.target_critic, self.actor_state, self.critic_state, batch)
        return float(cl), float(al)


class PendulumEnv:
    """Minimal Pendulum-v1 dynamics so the demo has no gym dependency."""

    def __init__(self, seed: int = 0):
        self.rng = np.random.default_rng(seed)
        self.max_torque = 2.0
        self.dt = 0.05
        self.state = None

    def reset(self):
        th = self.rng.uniform(-np.pi, np.pi)
        thdot = self.rng.uniform(-1, 1)
        self.state = np.array([th, thdot])
        return self._obs()

    def _obs(self):
        th, thdot = self.state
        return np.array([np.cos(th), np.sin(th), thdot], np.float32)

    def step(self, action):
        th, thdot = self.state
        u = float(np.clip(action[0], -self.max_torque, self.max_torque))
        g, m, l, dt = 10.0, 1.0, 1.0, self.dt
        cost = (((th + np.pi) % (2 * np.pi) - np.pi) ** 2
                + 0.1 * thdot ** 2 + 0.001 * u ** 2)
        thdot = thdot + (3 * g / (2 * l) * np.sin(th)
                         + 3.0 / (m * l ** 2) * u) * dt
        thdot = np.clip(thdot, -8, 8)
        th = th + thdot * dt
        self.state = np.array([th, thdot])
        return self._obs(), -cost, False, {}


def train_pendulum(episodes: int = 20, steps_per_ep: int = 200,
                   batch_size: int = 64, seed: int = 0, verbose=True):
    """main_ddpg.py:1-50 equivalent demo loop."""
    env = PendulumEnv(seed)
    agent = DDPGAgent(state_dim=3, action_dim=1, max_action=2.0, seed=seed)
    memory = ReplayMemory(50_000, 3, 1)
    rng = np.random.default_rng(seed)
    returns = []
    for ep in range(episodes):
        s = env.reset()
        total = 0.0
        for _ in range(steps_per_ep):
            a = agent.act(s, noise_scale=0.1, rng=rng)
            s2, r, done, _ = env.step(a)
            memory.push(s, a, r, s2, done)
            s = s2
            total += r
            if len(memory) >= batch_size:
                agent.update(memory.sample(rng, batch_size))
        returns.append(total)
        if verbose:
            print(f"episode {ep}: return {total:.1f}")
    return agent, returns
