"""PINO training loops: data + physics-residual losses.

reference: train_pino.py:41-130 (train_ns), libs/pino_utils/train_2d.py:13
(train_2d_operator), :119 (train_2d_burger), train_3d.py:16-250
(train/mixed_train), eval_3d.py:15 (eval_ns).

TPU re-design: iteration loop is a lax.scan over shuffled batches with the
composite loss (xy * data + ic * loss_ic + f * loss_f) compiled once;
metrics fetched per chunk.
"""
from __future__ import annotations

import time
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.losses import SimpleLpLoss
from ..ops.pde_losses import (get_forcing, pino_loss_3d, pino_loss_burgers,
                              darcy_loss)


def train_ns(model, data, *, iterations: int = 2000, batch_size: int = 4,
             learning_rate: float = 1e-3, milestones=None, gamma: float = 0.5,
             xy_weight: float = 5.0, ic_weight: float = 1.0,
             f_weight: float = 1.0, t_interval: float = 1.0,
             params=None, rng=None, log_interval: int = 200,
             eval_data=None, verbose: bool = True):
    """Kolmogorov-flow PINO pretrain/finetune (train_pino.py:41-130).

    data: (u, a, re) arrays — u (N,S,S,T), a (N,S,S,T,4), re (N,).
    Returns (params, history).
    """
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    u, a, re = data
    n = u.shape[0]
    S, T = u.shape[1], u.shape[3]
    forcing = get_forcing(S)
    lp = SimpleLpLoss(size_average=True)

    if milestones is None:
        schedule = learning_rate
    else:
        from .optimizers import multistep_lr
        schedule = multistep_lr(learning_rate, milestones, gamma)
    opt = optax.adam(schedule)

    if params is None:
        rng, init_rng = jax.random.split(rng)
        params = jax.jit(model.init)(init_rng, a[:1], re[:1])["params"]
    opt_state = opt.init(params)

    def loss_fn(p, ab, ub, reb):
        out = model.apply({"params": p}, ab, reb).squeeze(-1)  # (B,S,S,T)
        data_loss = lp(out, ub)
        u0 = ab[..., 0, -1]  # initial vorticity channel at t=0
        visc = 1.0 / reb
        loss_ic, loss_f = pino_loss_3d(out, u0, forcing, visc, t_interval)
        total = (xy_weight * data_loss + ic_weight * loss_ic
                 + f_weight * loss_f)
        return total, (data_loss, loss_ic, loss_f)

    @jax.jit
    def run_chunk(params, opt_state, keys, u, a, re):
        def step(carry, key):
            p, s = carry
            idx = jax.random.choice(key, n, (batch_size,), replace=False)
            (total, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(
                p, a[idx], u[idx], re[idx])
            updates, s = opt.update(g, s)
            return (optax.apply_updates(p, updates), s), \
                (total, aux[0], aux[1], aux[2])

        (params, opt_state), metrics = jax.lax.scan(
            step, (params, opt_state), keys)
        return params, opt_state, metrics

    history = {"total": [], "data": [], "ic": [], "f": []}
    done = 0
    while done < iterations:
        k = min(log_interval, iterations - done)
        rng, sub = jax.random.split(rng)
        keys = jax.random.split(sub, k)
        t0 = time.perf_counter()
        params, opt_state, metrics = run_chunk(params, opt_state, keys,
                                               u, a, re)
        metrics = jax.device_get(metrics)
        for name, vals in zip(["total", "data", "ic", "f"], metrics):
            history[name].extend(np.asarray(vals).tolist())
        done += k
        if verbose:
            print(f"iter {done}/{iterations}: total {metrics[0][-1]:.4f} "
                  f"data {metrics[1][-1]:.4f} ic {metrics[2][-1]:.4f} "
                  f"f {metrics[3][-1]:.4f} "
                  f"({(time.perf_counter() - t0) / k * 1e3:.1f} ms/iter)")
    if eval_data is not None:
        history["eval"] = eval_ns(model, params, eval_data)
        if verbose:
            print(f"eval rel-L2: {history['eval']:.5f}")
    return params, history


def eval_ns(model, params, data, batch_size: int = 8):
    """Mean relative L2 on held-out trajectories (eval_3d.py:15)."""
    u, a, re = data
    lp = SimpleLpLoss(size_average=True)
    n = u.shape[0] // batch_size * batch_size

    @jax.jit
    def batch_err(p, ab, ub, reb):
        # params passed as an argument, NOT closed over: closure constants
        # get embedded in the compiled program (huge payloads over
        # remote-compile links, and a recompile per new params)
        out = model.apply({"params": p}, ab, reb).squeeze(-1)
        return lp(out, ub)

    errs = [batch_err(params, a[i:i + batch_size], u[i:i + batch_size],
                      re[i:i + batch_size])
            for i in range(0, n, batch_size)]
    return float(np.mean(jax.device_get(errs)))


def train_2d_operator(model, data, *, iterations=1000, batch_size=8,
                      learning_rate=1e-3, data_weight=5.0, f_weight=1.0,
                      params=None, rng=None, verbose=True,
                      log_interval=200):
    """Darcy operator training with FDM residual loss (train_2d.py:13)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    a, u = data
    n = a.shape[0]
    lp = SimpleLpLoss(size_average=True)
    opt = optax.adam(learning_rate)
    if params is None:
        rng, init_rng = jax.random.split(rng)
        params = jax.jit(model.init)(init_rng, a[:1, ..., None])["params"]
    opt_state = opt.init(params)

    def loss_fn(p, ab, ub):
        out = model.apply({"params": p}, ab[..., None]).squeeze(-1)
        dl = lp(out, ub)
        fl = darcy_loss(out, ab)
        return data_weight * dl + f_weight * fl, (dl, fl)

    @jax.jit
    def run_chunk(params, opt_state, keys, a, u):
        def step(carry, key):
            p, s = carry
            idx = jax.random.choice(key, n, (batch_size,), replace=False)
            (total, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(
                p, a[idx], u[idx])
            updates, s = opt.update(g, s)
            return (optax.apply_updates(p, updates), s), (total, *aux)

        return jax.lax.scan(step, (params, opt_state), keys)

    done = 0
    history = {"total": [], "data": [], "f": []}
    while done < iterations:
        k = min(log_interval, iterations - done)
        rng, sub = jax.random.split(rng)
        (params, opt_state), metrics = run_chunk(params, opt_state,
                                                 jax.random.split(sub, k),
                                                 a, u)
        metrics = jax.device_get(metrics)
        for name, vals in zip(["total", "data", "f"], metrics):
            history[name].extend(np.asarray(vals).tolist())
        done += k
        if verbose:
            print(f"iter {done}/{iterations}: total {metrics[0][-1]:.4f}")
    return params, history
