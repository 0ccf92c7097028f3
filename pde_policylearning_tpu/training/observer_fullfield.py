"""Physics-informed full-field observer training.

reference: run_pde_observers.py:200-239 (FullFieldNSDataset branch):
boundary v-plane -> PINObserverFullField multi-plane prediction, trained
with decoded rel-L2 data loss + the channel env's RHS-difference pde_loss
(control_env.py:627-633) weighted by `pde_loss_weight`.

The env physics term runs in-graph: predictions are scattered into the true
V field and the momentum RHS difference is computed with the same
`compute_rhs` used by the DNS — vmapped over batch and time.
"""
from __future__ import annotations

import time
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..envs import channel_flow as cf


def pde_loss_fields(grid, U, V_true, V_pred, W, dPdx):
    """||RHS(U, V_true, W) - RHS(U, V_pred, W)|| (control_env.py:627-633)."""
    Fu_t, Fv_t, Fw_t = cf.compute_rhs(grid, U, V_true, W, dPdx)
    Fu_p, Fv_p, Fw_p = cf.compute_rhs(grid, U, V_pred, W, dPdx)
    return (jnp.linalg.norm(Fu_t - Fu_p) + jnp.linalg.norm(Fv_t - Fv_p)
            + jnp.linalg.norm(Fw_t - Fw_p))


def train_fullfield_observer(model, dataset, grid, *, plane_indexs,
                             n_epochs=10, batch_size=2, learning_rate=1e-3,
                             pde_loss_weight=0.0, rng=None, verbose=True):
    """dataset: FullFieldNSDataset.  Returns (params, history)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    v_plane = jnp.asarray(dataset.v_plane, jnp.float32)   # (N, T, X, Z)
    v_field = jnp.asarray(dataset.v_field, jnp.float32)   # (N, T, P, X, Z)
    U = jnp.asarray(dataset.U, jnp.float32)
    V = jnp.asarray(dataset.V, jnp.float32)
    W = jnp.asarray(dataset.W, jnp.float32)
    dpdx = jnp.asarray(dataset.dpdx, jnp.float32)
    re = jnp.full((v_plane.shape[0],), float(dataset.re), jnp.float32)
    norm = dataset.bound_v_norm
    plane_idx = jnp.asarray(plane_indexs)

    N, T = v_plane.shape[0], v_plane.shape[1]
    opt = optax.adam(learning_rate)
    rng, init_rng = jax.random.split(rng)
    x0 = jnp.moveaxis(v_plane[:1], 1, -1)[..., None]  # (1, X, Z, T, 1)
    params = jax.jit(model.init)(init_rng, x0, re[:1])["params"]
    opt_state = opt.init(params)

    def loss_fn(p, vp, vf, Ub, Vb, Wb, dpdxb, reb):
        x = jnp.moveaxis(vp, 1, -1)[..., None]          # (B, X, Z, T, 1)
        pred = model.apply({"params": p}, x, reb)       # (B, P, X, Z, T)
        pred = jnp.moveaxis(pred, -1, 1)                # (B, T, P, X, Z)
        pred_dec = norm.decode(pred).astype(vp.dtype)
        target_dec = norm.decode(vf).astype(vp.dtype)
        b = pred.shape[0]
        data_loss = jnp.mean(
            jnp.linalg.norm(pred_dec.reshape(b, -1)
                            - target_dec.reshape(b, -1), axis=1)
            / (jnp.linalg.norm(target_dec.reshape(b, -1), axis=1) + 1e-12))
        if pde_loss_weight <= 0:
            return data_loss, (data_loss, 0.0)

        def sample_pde(Ui, Vi, Wi, pred_i, dpdx_i):
            # scatter predicted planes into the true V field, per timestep
            def per_t(Ut, Vt, Wt, pt, dt_):
                V_pred = Vt.at[:, plane_idx, :].set(
                    jnp.moveaxis(pt, 0, 1))
                return pde_loss_fields(grid, Ut, Vt, V_pred, Wt, dt_)
            return jnp.mean(jax.vmap(per_t)(Ui, Vi, Wi, pred_i, dpdx_i))

        pde = jnp.mean(jax.vmap(sample_pde)(Ub, Vb, Wb, pred_dec, dpdxb))
        return data_loss + pde_loss_weight * pde, (data_loss, pde)

    n_batches = max(1, N // batch_size)

    @jax.jit
    def run_epoch(params, opt_state, key, arrays):
        v_plane, v_field, U, V, W, dpdx, re = arrays
        perm = jax.random.permutation(key, N)[:n_batches * batch_size]
        perm = perm.reshape(n_batches, batch_size)

        def step(carry, idx):
            p, s = carry
            (total, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(
                p, v_plane[idx], v_field[idx], U[idx], V[idx], W[idx],
                dpdx[idx], re[idx])
            up, s = opt.update(g, s)
            return (optax.apply_updates(p, up), s), (total, *aux)

        (params, opt_state), metrics = jax.lax.scan(
            step, (params, opt_state), perm)
        return params, opt_state, metrics

    arrays = (v_plane, v_field, U, V, W, dpdx, re)
    history = {"total": [], "data": [], "pde": []}
    # fetch metrics only every `log_every` epochs: on a remote-attached
    # TPU every device_get is a sync point (and a chance to hit the axon
    # lost-RPC wedge); un-fetched epochs stay fully async
    log_every = 10 if n_epochs >= 30 else 1
    pending = []
    for epoch in range(n_epochs):
        rng, sub = jax.random.split(rng)
        t0 = time.perf_counter()
        params, opt_state, metrics = run_epoch(params, opt_state, sub,
                                               arrays)
        pending.append(metrics)
        if (epoch + 1) % log_every and epoch + 1 != n_epochs:
            continue
        for m in jax.device_get(pending):
            for name, vals in zip(["total", "data", "pde"], m):
                history[name].append(float(np.mean(vals)))
        pending = []
        if verbose:
            print(f"epoch {epoch + 1}/{n_epochs}: total "
                  f"{history['total'][-1]:.4f} data "
                  f"{history['data'][-1]:.4f} pde {history['pde'][-1]:.4f} "
                  f"({(time.perf_counter() - t0):.2f}s)")
    return params, history


def eval_fullfield_observer(model, params, dataset, batch_size=4):
    """Held-out decoded data rel-L2 (the eval half of the reference's
    FullFieldNSDataset branch, run_pde_observers.py:244-280)."""
    v_plane = jnp.asarray(dataset.v_plane, jnp.float32)
    v_field = jnp.asarray(dataset.v_field, jnp.float32)
    re = jnp.full((v_plane.shape[0],), float(dataset.re), jnp.float32)
    norm = dataset.bound_v_norm

    # params ride as a jit ARGUMENT: closing over them embeds the whole
    # tree in the compile payload (906 MB for the reference-scale
    # fullfield model) — the remote_compile request then takes tens of
    # minutes and tends to drop the tunnel (the round-4 eval failures)
    @jax.jit
    def rel_l2(p, vp, vf, reb):
        x = jnp.moveaxis(vp, 1, -1)[..., None]
        pred = jnp.moveaxis(model.apply({"params": p}, x, reb), -1, 1)
        pred_dec = norm.decode(pred)
        target_dec = norm.decode(vf)
        b = pred.shape[0]
        return jnp.sum(
            jnp.linalg.norm(pred_dec.reshape(b, -1)
                            - target_dec.reshape(b, -1), axis=1)
            / (jnp.linalg.norm(target_dec.reshape(b, -1), axis=1) + 1e-12))

    N = v_plane.shape[0]
    # ONE device fetch for the whole eval, and the FULL loop (compile
    # included) retried on transient tunnel failures: per-batch float()
    # fetches are each a sync point and a lost-RPC hazard on a
    # remote-attached TPU, and remote_compile itself can drop the
    # connection (three round-4 fullfield evals died on tunnel outages)
    for attempt in range(3):
        try:
            totals = [rel_l2(params, v_plane[i:i + batch_size],
                             v_field[i:i + batch_size],
                             re[i:i + batch_size])
                      for i in range(0, N, batch_size)]
            return float(jnp.sum(jnp.stack(totals))) / N
        except jax.errors.JaxRuntimeError:
            if attempt == 2:
                raise
            time.sleep(60.0)
