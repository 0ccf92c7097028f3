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
             eval_data=None, compute_dtype=None, accum_steps: int = 1,
             checkpoint_fn=None, opt_state=None, start_iter: int = 0,
             verbose: bool = True):
    """Kolmogorov-flow PINO pretrain/finetune (train_pino.py:41-130).

    data: (u, a, re) arrays — u (N,S,S,T), a (N,S,S,T,4), re (N,).
    compute_dtype: optional forward dtype (e.g. jnp.bfloat16 for the MXU's
    native path); master params/optimizer/losses stay f32 — the PDE
    residual (spectral derivatives) is always evaluated on the f32 output.
    accum_steps: gradient accumulation — each optimizer step averages the
    gradients of `accum_steps` sequential micro-batches of size
    batch_size // accum_steps, so the reference's batch-4 budget
    (configs/pino-observer-pretrain-1s.yaml:36) fits single-chip HBM at
    the full 128x128x65 resolution (b4 activations OOM; b1 fits).
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
    if opt_state is None:
        opt_state = opt.init(params)
    else:
        # crash-resume: restore Adam moments + schedule step saved by
        # checkpoint_fn so a resumed multi-hour pretrain continues the
        # same trajectory (start_iter skips the completed work)
        opt_state = jax.tree.unflatten(
            jax.tree.structure(opt.init(params)),
            jax.tree.leaves(opt_state))

    def loss_fn(p, ab, ub, reb):
        u0 = ab[..., 0, -1]  # initial vorticity channel at t=0 (full f32)
        if compute_dtype is not None:
            p = jax.tree.map(lambda w: w.astype(compute_dtype), p)
            ab = ab.astype(compute_dtype)
            reb = reb.astype(compute_dtype)  # mixed dtypes re-promote to f32
        out = model.apply({"params": p}, ab, reb).squeeze(-1)  # (B,S,S,T)
        out = out.astype(ub.dtype)
        data_loss = lp(out, ub)
        visc = 1.0 / reb.astype(ub.dtype)  # f32 even under bf16 compute
        loss_ic, loss_f = pino_loss_3d(out, u0, forcing, visc, t_interval)
        total = (xy_weight * data_loss + ic_weight * loss_ic
                 + f_weight * loss_f)
        return total, (data_loss, loss_ic, loss_f)

    if batch_size % accum_steps:
        raise ValueError(f"batch_size {batch_size} not divisible by "
                         f"accum_steps {accum_steps}")
    micro = batch_size // accum_steps

    # donate params + opt_state: each chunk's inputs are the previous
    # chunk's outputs and are never read again — donation lets XLA reuse
    # the buffers in place instead of holding both generations live
    @partial(jax.jit, donate_argnums=(0, 1))
    def run_chunk(params, opt_state, keys, u, a, re):
        def step(carry, key):
            p, s = carry
            idx = jax.random.choice(key, n, (batch_size,), replace=False)
            if accum_steps == 1:
                (total, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    p, a[idx], u[idx], re[idx])
            else:
                # sequential micro-batches at micro-batch memory; the mean
                # of per-micro-batch grads equals the full-batch grad
                # (size_average LpLoss is a per-sample mean).
                def acc(carry, ib):
                    g_acc, m_acc = carry
                    (tot, aux), g = jax.value_and_grad(
                        loss_fn, has_aux=True)(p, a[ib], u[ib], re[ib])
                    g_acc = jax.tree.map(jnp.add, g_acc, g)
                    m_acc = tuple(x + y for x, y in zip(
                        m_acc, (tot,) + aux))
                    return (g_acc, m_acc), None
                zero_g = jax.tree.map(jnp.zeros_like, p)
                (g, msum), _ = jax.lax.scan(
                    acc, (zero_g, (0.0, 0.0, 0.0, 0.0)),
                    idx.reshape(accum_steps, micro))
                g = jax.tree.map(lambda x: x / accum_steps, g)
                total, aux = msum[0] / accum_steps, tuple(
                    x / accum_steps for x in msum[1:])
            updates, s = opt.update(g, s)
            return (optax.apply_updates(p, updates), s), \
                (total, aux[0], aux[1], aux[2])

        (params, opt_state), metrics = jax.lax.scan(
            step, (params, opt_state), keys)
        return params, opt_state, metrics

    history = {"total": [], "data": [], "ic": [], "f": []}
    done = start_iter
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
                  f"({(time.perf_counter() - t0) / k * 1e3:.1f} ms/iter)",
                  flush=True)
        if checkpoint_fn is not None:
            # crash-resume hook for multi-hour runs on the fragile remote
            # worker (reference analog: save_step, pino_utils/utils.py:156)
            checkpoint_fn(done, params, opt_state)
    if eval_data is not None:
        history["eval"] = eval_ns(model, params, eval_data)
        if verbose:
            print(f"eval rel-L2: {history['eval']:.5f}")
    return params, history


def mixed_train(model, data, *, iterations=1000, batch_size=4,
                eq_batch_size=4, learning_rate=1e-3, xy_weight=5.0,
                ic_weight=1.0, f_weight=1.0, t_interval=1.0, S=None,
                params=None, rng=None, log_interval=200, verbose=True):
    """Alternate data-loss iterations with equation-only iterations on
    random GRF initial conditions (train_3d.py:125-250 mixed_train): the
    physics loss needs no labels, so fresh ICs regularize beyond the
    dataset."""
    from ..data.synthetic import gaussian_rf_2d
    from ..data.pino_datasets import get_grid3d

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    u, a, re = data
    n = u.shape[0]
    S = S or u.shape[1]
    T = u.shape[3]
    forcing = get_forcing(S)
    lp = SimpleLpLoss(size_average=True)
    opt = optax.adam(learning_rate)
    if params is None:
        rng, init_rng = jax.random.split(rng)
        params = jax.jit(model.init)(init_rng, a[:1], re[:1])["params"]
    opt_state = opt.init(params)
    gx, gy, gt = get_grid3d(S, T)
    grid3 = jnp.asarray(np.concatenate([gx, gy, gt], axis=-1),
                        jnp.float32)  # (1, S, S, T, 3)

    def data_loss_fn(p, ab, ub, reb):
        out = model.apply({"params": p}, ab, reb).squeeze(-1)
        dl = lp(out, ub)
        u0 = ab[..., 0, -1]
        ic, f = pino_loss_3d(out, u0, forcing, 1.0 / reb, t_interval)
        return xy_weight * dl + ic_weight * ic + f_weight * f

    def eq_loss_fn(p, w0, reb):
        B = w0.shape[0]
        a_in = jnp.concatenate(
            [jnp.broadcast_to(grid3, (B, S, S, T, 3)),
             jnp.broadcast_to(w0[..., None, None], (B, S, S, T, 1))],
            axis=-1)
        out = model.apply({"params": p}, a_in, reb).squeeze(-1)
        ic, f = pino_loss_3d(out, w0, forcing, 1.0 / reb, t_interval)
        return ic_weight * ic + f_weight * f

    @jax.jit
    def run_pair(params, opt_state, key, u, a, re):
        k1, k2, k3 = jax.random.split(key, 3)
        idx = jax.random.choice(k1, n, (batch_size,), replace=False)
        dl, g = jax.value_and_grad(data_loss_fn)(params, a[idx], u[idx],
                                                 re[idx])
        up, opt_state = opt.update(g, opt_state)
        params = optax.apply_updates(params, up)
        w0 = gaussian_rf_2d(k2, S, eq_batch_size).astype(jnp.float32)
        re_s = jax.random.choice(k3, re, (eq_batch_size,))
        el, g2 = jax.value_and_grad(eq_loss_fn)(params, w0, re_s)
        up2, opt_state = opt.update(g2, opt_state)
        return optax.apply_updates(params, up2), opt_state, dl, el

    history = {"data": [], "eq": []}
    for i in range(iterations):
        rng, sub = jax.random.split(rng)
        params, opt_state, dl, el = run_pair(params, opt_state, sub,
                                             u, a, re)
        if (i + 1) % log_interval == 0:
            dl, el = float(dl), float(el)
            history["data"].append(dl)
            history["eq"].append(el)
            if verbose:
                print(f"iter {i + 1}/{iterations}: data {dl:.4f} "
                      f"eq {el:.4f}")
    return params, history


def progressive_train(model, datasets, *, iters_per_stage=1000, **kwargs):
    """Train through progressively finer datasets (train_3d.py:258):
    `datasets` is a list of (u, a, re) tuples ordered coarse -> fine."""
    params = kwargs.pop("params", None)
    history = []
    for stage, data in enumerate(datasets):
        params, h = train_ns(model, data, iterations=iters_per_stage,
                             params=params, **kwargs)
        history.append(h)
    return params, history


def train_2d_burger(model, data, *, iterations=1000, batch_size=8,
                    learning_rate=1e-3, visc=0.01, ic_weight=5.0,
                    f_weight=1.0, data_weight=1.0, params=None, rng=None,
                    verbose=True, log_interval=200):
    """Burgers PINO training (train_2d.py:119): data rel-L2 + IC MSE +
    spectral FDM residual.  data: (u0 (N, nx), u (N, nt, nx))."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    u0, u = data
    n = u0.shape[0]
    lp = SimpleLpLoss(size_average=True)
    opt = optax.adam(learning_rate)
    nt = u.shape[1]
    if params is None:
        rng, init_rng = jax.random.split(rng)
        x0 = jnp.broadcast_to(u0[:1, None, :, None],
                              (1, nt, u0.shape[1], 1))
        params = jax.jit(model.init)(init_rng, x0)["params"]
    opt_state = opt.init(params)

    def loss_fn(p, u0b, ub):
        nt, nx = ub.shape[1], ub.shape[2]
        x_in = jnp.broadcast_to(u0b[:, None, :, None],
                                (u0b.shape[0], nt, nx, 1))
        out = model.apply({"params": p}, x_in).squeeze(-1)
        dl = lp(out, ub)
        ic, f = pino_loss_burgers(out, u0b, visc)
        return data_weight * dl + ic_weight * ic + f_weight * f, (dl, ic, f)

    @jax.jit
    def run_chunk(params, opt_state, keys, u0, u):
        def step(carry, key):
            p, s = carry
            idx = jax.random.choice(key, n, (batch_size,), replace=False)
            (total, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(
                p, u0[idx], u[idx])
            up, s = opt.update(g, s)
            return (optax.apply_updates(p, up), s), (total, *aux)

        return jax.lax.scan(step, (params, opt_state), keys)

    history = {"total": []}
    done = 0
    while done < iterations:
        k = min(log_interval, iterations - done)
        rng, sub = jax.random.split(rng)
        (params, opt_state), metrics = run_chunk(
            params, opt_state, jax.random.split(sub, k), u0, u)
        history["total"].extend(
            np.asarray(jax.device_get(metrics[0])).tolist())
        done += k
        if verbose:
            print(f"iter {done}/{iterations}: total "
                  f"{history['total'][-1]:.4f}")
    return params, history


def eval_ns(model, params, data, batch_size: int = 8):
    """Mean relative L2 on held-out trajectories (eval_3d.py:15)."""
    u, a, re = data
    lp = SimpleLpLoss(size_average=True)
    batch_size = min(batch_size, u.shape[0])
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
