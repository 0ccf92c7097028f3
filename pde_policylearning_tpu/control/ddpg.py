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


def train_ddpg_channel_on_device(
        n_steps: int = 8192, warmup: int = 256, buffer_size: int = 8192,
        batch_size: int = 64, seed: int = 0, noise_scale: float = 0.3,
        obs_scale: float = 100.0, action_clip: float = 0.01,
        reward_scale: float = 1000.0, gamma: float = 0.99,
        tau: float = 0.005, actor_lr: float = 1e-4,
        critic_lr: float = 1e-3, hidden: int = 256,
        env_kwargs: Optional[dict] = None, verbose: bool = True):
    """DDPG on the channel DNS with EVERYTHING on device.

    The reference ships DDPG only as a standalone Pendulum demo
    (libs/ddpg/main_ddpg.py); this closes the loop it scaffolded: the agent
    trains directly on wall-pressure observations of the 3-D turbulent
    channel.  On a remote-attached TPU a per-step host round-trip costs
    ~5.7 s, so the classic gym loop (ChannelGymEnv) is unusable for
    training; here the rollout, the replay ring buffer, the minibatch
    sampling, and the actor/critic/Polyak updates all live inside ONE
    `lax.scan` in the fused kernels' (y, x*z) state layout — one host
    fetch at the very end.

    Schedule (agent_ddpg.py:83-117 semantics): `warmup` exploration steps
    fill the buffer with noise-only actions, then one update per env step.
    obs = top-wall pressure * obs_scale (flattened); action = opV2 wall
    transpiration, zero-net-flux, clipped to +-action_clip; reward =
    -shear_stress * reward_scale (drag proxy).

    Returns (actor_params, metrics dict of per-step series).
    """
    import numpy as np

    from ..envs import NSControlEnv
    from ..envs import channel_flow as cf
    from ..envs import rk3_pallas as rk

    env = NSControlEnv(noise_scale=0.05, **(env_kwargs or {}))
    grid = env.grid
    Nx, Nz = grid.Nx, grid.Nz
    state_dim = Nx * Nz
    action_dim = Nx * Nz

    actor = Actor(action_dim, max_action=action_clip, hidden=hidden)
    critic = Critic(hidden=hidden)
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    s0 = jnp.zeros((1, state_dim))
    a0 = jnp.zeros((1, action_dim))
    ap = actor.init(k1, s0)["params"]
    cp = critic.init(k2, s0, a0)["params"]
    ta = jax.tree.map(jnp.copy, ap)
    tc = jax.tree.map(jnp.copy, cp)
    a_opt = optax.adam(actor_lr)
    c_opt = optax.adam(critic_lr)
    a_st = a_opt.init(ap)
    c_st = c_opt.init(cp)

    if not cf._rk3_fused_eligible(env.state.U):
        raise NotImplementedError(
            "on-device DDPG requires the fused kernel path "
            "(f32, default grid)")

    kstate = rk.state_to_kstate(env.state)
    _, p2_0 = cf.boundary_pressures(grid, env.state)
    zeros_op = jnp.zeros((Nx, Nz), jnp.float32)
    sigma = noise_scale * action_clip

    def project_action(a):
        a2 = a.reshape(Nx, Nz)
        a2 = a2 - jnp.mean(a2)                 # zero net wall mass flux
        return jnp.clip(a2, -action_clip, action_clip)

    def env_transition(st, p2, a2, _k):
        st, p2n, info = rk.env_step_k(grid, st, zeros_op, a2)
        shear = info["drag_reduction/1_shear_stress"]
        return st, p2n, shear

    def buf_write(buf, row, i):
        return jax.lax.dynamic_update_slice(
            buf, row[None].astype(buf.dtype), (i, 0))

    def warmup_body(carry, k):
        st, p2, bufs, i = carry
        obs = (p2 * obs_scale).reshape(-1)
        a = sigma * jax.random.normal(k, (action_dim,))
        a2 = project_action(a)
        st, p2n, shear = env_transition(st, p2, a2, k)
        obs2 = (p2n * obs_scale).reshape(-1)
        r = -shear * reward_scale
        bs_, ba_, br_, bs2_ = bufs
        bufs = (buf_write(bs_, obs, i), buf_write(ba_, a2.reshape(-1), i),
                buf_write(br_, r[None], i), buf_write(bs2_, obs2, i))
        return (st, p2n, bufs, i + 1), shear

    def ddpg_update(ap, cp, ta, tc, a_st, c_st, batch):
        """agent_ddpg.py:83-117 math (same as DDPGAgent._make_update)."""
        s, a, r, s2 = batch
        a2 = actor.apply({"params": ta}, s2)
        q_target = r + gamma * critic.apply({"params": tc}, s2, a2)

        def critic_loss(cp):
            q = critic.apply({"params": cp}, s, a)
            return jnp.mean((q - jax.lax.stop_gradient(q_target)) ** 2)

        cl, gc = jax.value_and_grad(critic_loss)(cp)
        up, c_st = c_opt.update(gc, c_st)
        cp = optax.apply_updates(cp, up)

        def actor_loss(ap):
            return -jnp.mean(critic.apply(
                {"params": cp}, s, actor.apply({"params": ap}, s)))

        al, ga = jax.value_and_grad(actor_loss)(ap)
        up, a_st = a_opt.update(ga, a_st)
        ap = optax.apply_updates(ap, up)
        polyak = lambda t, p: jax.tree.map(
            lambda t_, p_: (1 - tau) * t_ + tau * p_, t, p)
        return ap, cp, polyak(ta, ap), polyak(tc, cp), a_st, c_st, cl, al

    def train_body(carry, k):
        st, p2, bufs, i, count, ap, cp, ta, tc, a_st, c_st = carry
        kn, ks = jax.random.split(k)
        obs = (p2 * obs_scale).reshape(-1)
        a = actor.apply({"params": ap}, obs[None])[0]
        a = a + sigma * jax.random.normal(kn, a.shape)
        a2 = project_action(a)
        st, p2n, shear = env_transition(st, p2, a2, kn)
        obs2 = (p2n * obs_scale).reshape(-1)
        r = -shear * reward_scale
        bs_, ba_, br_, bs2_ = bufs
        bufs = (buf_write(bs_, obs, i), buf_write(ba_, a2.reshape(-1), i),
                buf_write(br_, r[None], i), buf_write(bs2_, obs2, i))
        i = (i + 1) % buffer_size
        count = jnp.minimum(count + 1, buffer_size)
        # uniform minibatch from the filled prefix (traced count)
        u = jax.random.uniform(ks, (batch_size,))
        idx = jnp.floor(u * count).astype(jnp.int32)
        batch = (bufs[0][idx], bufs[1][idx], bufs[2][idx], bufs[3][idx])
        ap, cp, ta, tc, a_st, c_st, cl, al = ddpg_update(
            ap, cp, ta, tc, a_st, c_st, batch)
        return (st, p2n, bufs, i, count, ap, cp, ta, tc, a_st, c_st), \
            (shear, cl, al)

    @jax.jit
    def run(kstate, p2, ap, cp, ta, tc, a_st, c_st, key):
        bufs = (jnp.zeros((buffer_size, state_dim), jnp.float32),
                jnp.zeros((buffer_size, action_dim), jnp.float32),
                jnp.zeros((buffer_size, 1), jnp.float32),
                jnp.zeros((buffer_size, state_dim), jnp.float32))
        kw, kt = jax.random.split(key)
        (kstate, p2, bufs, i), warm_shear = jax.lax.scan(
            warmup_body, (kstate, p2, bufs, 0), jax.random.split(kw, warmup))
        carry = (kstate, p2, bufs, i, jnp.asarray(warmup), ap, cp, ta, tc,
                 a_st, c_st)
        carry, (shear, cl, al) = jax.lax.scan(
            train_body, carry, jax.random.split(kt, n_steps))
        ap = carry[5]
        return ap, warm_shear, shear, cl, al

    ap, warm_shear, shear, cl, al = run(
        kstate, p2_0, ap, cp, ta, tc, a_st, c_st, k3)
    metrics = {"warmup_shear": np.asarray(warm_shear),
               "shear": np.asarray(shear),
               "critic_loss": np.asarray(cl),
               "actor_loss": np.asarray(al)}
    if verbose:
        n4 = max(1, n_steps // 4)
        for q in range(4):
            seg = metrics["shear"][q * n4:(q + 1) * n4]
            if len(seg):
                print(f"steps [{q * n4}, {q * n4 + len(seg)}): mean shear "
                      f"{seg.mean():.6e}  critic "
                      f"{metrics['critic_loss'][q * n4:(q + 1) * n4].mean():.4f}")
    return ap, metrics


def make_ddpg_policy(actor_params, Nx, Nz, action_clip: float = 0.01,
                     obs_scale: float = 100.0, hidden: int = 256):
    """Closed-loop policy wrapper for a trained DDPG actor (deterministic,
    no exploration noise) — pluggable into control.loop.run_closed_loop
    alongside the observer policies."""
    actor = Actor(Nx * Nz, max_action=action_clip, hidden=hidden)

    def policy(st, p2, _key):
        obs = (p2 * obs_scale).reshape(1, -1)
        a = actor.apply({"params": actor_params}, obs)[0]
        a2 = a.reshape(Nx, Nz)
        a2 = a2 - jnp.mean(a2)
        a2 = jnp.clip(a2, -action_clip, action_clip)
        return jnp.zeros_like(a2), a2

    return policy


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
