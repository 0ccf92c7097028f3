"""DINo training: auto-decoding + latent dynamics.

reference: train_dino.py:165-265 (alternating optimization of decoder,
dynamics, and per-sequence latent states) and libs/DINo/utils.py:199
(eval_dino with test-time latent adaptation).

TPU re-design: one jitted step updates all three parameter groups (decoder,
dynamics at lr/10, latent states at lr/10 — the reference's optimizer split)
with the two losses:
  auto-dec: MSE(decoder(coords, states), data) on the observation mask
  dynamics: MSE(odeint(dyn, states[:, 0], t), states.detach())
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..models.dino import odeint_rk4


def init_dino(dec, dyn, data_shape, code_dim, state_dim, coord_dim, rng):
    """Initialize decoder/dynamics params and per-sequence latent states.

    data: (N, T, H, W, state_dim).  states: (N, T, state_dim*code_dim)."""
    N, T = data_shape[0], data_shape[1]
    r1, r2 = jax.random.split(rng)
    coords = jnp.zeros((1, 1, 1, state_dim, coord_dim))
    codes = jnp.zeros((1, state_dim * code_dim))
    dec_params = jax.jit(dec.init)(r1, coords, codes)["params"]
    dyn_params = jax.jit(dyn.init)(r2, 0.0, codes)["params"]
    states = jnp.zeros((N, T, state_dim * code_dim))
    return dec_params, dyn_params, states


def make_coords(H, W, coord_dim=2):
    """Normalized coordinate grid (H, W, coord_dim)."""
    xs = jnp.linspace(-1, 1, H)
    ys = jnp.linspace(-1, 1, W)
    X, Y = jnp.meshgrid(xs, ys, indexing="ij")
    return jnp.stack([X, Y], axis=-1)[..., :coord_dim]


def _decode_batch(dec, dec_params, coords, states, state_dim, code_dim):
    """coords (H, W, D); states (B, T, S*C) -> fields (B, T, H, W, S)."""
    B, T = states.shape[0], states.shape[1]
    H, W = coords.shape[0], coords.shape[1]
    x = jnp.broadcast_to(coords[None, None, :, :, None, :],
                         (B, T, H, W, state_dim, coords.shape[-1]))
    codes = states.reshape(B * T, state_dim * code_dim)
    x = x.reshape(B * T, H, W, state_dim, coords.shape[-1])
    out = dec.apply({"params": dec_params}, x, codes)
    return out.reshape(B, T, H, W, state_dim)


def train_dino(dec, dyn, data, t_grid, *, code_dim, state_dim=1,
               n_epochs=100, batch_size=16, lr=1e-2, mask=None,
               rng=None, log_interval=20, verbose=True,
               teacher_epsilon=0.99, coords=None):
    """Returns (dec_params, dyn_params, states, history).

    coords: optional (H, W, D) coordinate grid — e.g. xyz points on the
    sphere for the ShallowWater dataset (data_pdes.py ShallowWaterDataset
    coords); defaults to the planar normalized grid."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    data = jnp.asarray(data)
    N, T, H, W, S = data.shape
    assert S == state_dim
    coords = make_coords(H, W) if coords is None else jnp.asarray(coords)
    if mask is None:
        mask = jnp.ones((H, W), bool)

    rng, init_rng = jax.random.split(rng)
    dec_params, dyn_params, states = init_dino(
        dec, dyn, data.shape, code_dim, state_dim, coords.shape[-1],
        init_rng)

    opt_dec = optax.adam(lr)
    opt_dyn = optax.adam(lr / 10)
    opt_states = optax.adam(lr / 10)
    s_dec = opt_dec.init(dec_params)
    s_dyn = opt_dyn.init(dyn_params)
    s_states = opt_states.init(states)

    def autodec_loss(dec_params, batch_states, batch_data):
        out = _decode_batch(dec, dec_params, coords, batch_states,
                            state_dim, code_dim)
        diff = (out - batch_data) ** 2
        return jnp.mean(diff[:, :, mask, :])

    def dyn_loss(dyn_params, batch_states):
        def f(t, u):
            return dyn.apply({"params": dyn_params}, t, u)
        codes = odeint_rk4(f, batch_states[:, 0], t_grid)  # (T, B, SC)
        codes = jnp.swapaxes(codes, 0, 1)
        return jnp.mean((codes - jax.lax.stop_gradient(batch_states)) ** 2)

    @jax.jit
    def train_step(carry, idx, data):
        dec_params, dyn_params, states, s_dec, s_dyn, s_states = carry
        batch_states = states[idx]
        batch_data = data[idx]

        # (1) latent states + decoder via the auto-decoding loss
        def loss_states(bs, dp):
            return autodec_loss(dp, bs, batch_data)

        l_ad, (g_states, g_dec) = jax.value_and_grad(
            loss_states, argnums=(0, 1))(batch_states, dec_params)
        up_s, s_states = opt_states.update(
            jax.tree.map(lambda g: jnp.zeros_like(states).at[idx].set(g),
                         g_states), s_states)
        states = optax.apply_updates(states, up_s)
        up_d, s_dec = opt_dec.update(g_dec, s_dec)
        dec_params = optax.apply_updates(dec_params, up_d)

        # (2) dynamics matching the (frozen) latent trajectory
        l_dyn, g_dyn = jax.value_and_grad(dyn_loss)(dyn_params, batch_states)
        up_y, s_dyn = opt_dyn.update(g_dyn, s_dyn)
        dyn_params = optax.apply_updates(dyn_params, up_y)
        return (dec_params, dyn_params, states, s_dec, s_dyn, s_states), \
            (l_ad, l_dyn)

    carry = (dec_params, dyn_params, states, s_dec, s_dyn, s_states)
    history = {"autodec": [], "dyn": []}
    batch_size = min(batch_size, N)
    n_batches = max(1, N // batch_size)
    for epoch in range(n_epochs):
        rng, sub = jax.random.split(rng)
        perm = jax.random.permutation(sub, N)[:n_batches * batch_size]
        perm = perm.reshape(n_batches, batch_size)
        for bi in range(n_batches):
            carry, (l_ad, l_dyn) = train_step(carry, perm[bi], data)
        if (epoch + 1) % log_interval == 0 or epoch == n_epochs - 1:
            l_ad, l_dyn = float(l_ad), float(l_dyn)
            history["autodec"].append(l_ad)
            history["dyn"].append(l_dyn)
            if verbose:
                print(f"epoch {epoch + 1}/{n_epochs}: autodec {l_ad:.3e} "
                      f"dyn {l_dyn:.3e}")
    dec_params, dyn_params, states = carry[0], carry[1], carry[2]
    return dec_params, dyn_params, states, history


def train_dino_conditioned(dec, dyn, encoder, data, t_grid, *, code_dim,
                           state_dim=1, n_cond=2, n_epochs=50,
                           batch_size=16, lr=1e-2, mask=None, rng=None,
                           log_interval=20, verbose=True):
    """Conditioned DINo (train_dino.py n_cond>0 path + eval_dino_cond,
    DINo/utils.py:275): a SetEncoder aggregates the first `n_cond` frames'
    latent codes into the forecast initial code; the encoder trains jointly
    with the dynamics to match the full latent trajectory."""
    import optax as _optax

    dec_params, dyn_params, states, hist = train_dino(
        dec, dyn, data, t_grid, code_dim=code_dim, state_dim=state_dim,
        n_epochs=n_epochs, batch_size=batch_size, lr=lr, mask=mask,
        rng=rng, log_interval=log_interval, verbose=verbose)

    rng = rng if rng is not None else jax.random.PRNGKey(1)
    enc_params = jax.jit(encoder.init)(
        rng, states[:1, :n_cond])["params"]
    opt = _optax.adam(lr / 10)
    opt_state = opt.init(enc_params)

    def enc_loss(ep, batch_states):
        code0 = encoder.apply({"params": ep}, batch_states[:, :n_cond])

        def f(t, u):
            return dyn.apply({"params": dyn_params}, t, u)
        codes = odeint_rk4(f, code0, t_grid)
        codes = jnp.swapaxes(codes, 0, 1)
        return jnp.mean((codes - batch_states) ** 2)

    @jax.jit
    def enc_step(ep, s, batch_states):
        l, g = jax.value_and_grad(enc_loss)(ep, batch_states)
        up, s = opt.update(g, s)
        return _optax.apply_updates(ep, up), s, l

    for i in range(n_epochs):
        enc_params, opt_state, l = enc_step(enc_params, opt_state, states)
    hist["encoder"] = float(l)
    if verbose:
        print(f"encoder fit loss: {float(l):.3e}")
    return dec_params, dyn_params, enc_params, states, hist


def eval_dino_cond(dec, dyn, encoder, dec_params, dyn_params, enc_params,
                   data, t_grid, *, code_dim, state_dim=1, n_cond=2,
                   adapt_steps=100, adapt_lr=1e-2, mask=None):
    """Conditioned evaluation (DINo/utils.py:275): adapt codes on the first
    n_cond frames, aggregate with the SetEncoder, forecast from the
    aggregated code."""
    res = eval_dino(dec, dyn, dec_params, dyn_params, data[:, :n_cond],
                    t_grid[:n_cond], code_dim=code_dim,
                    state_dim=state_dim, adapt_steps=adapt_steps,
                    adapt_lr=adapt_lr, n_cond_frames=n_cond, mask=mask,
                    return_codes=True)
    codes_cond = res["codes"]
    code0 = encoder.apply({"params": enc_params}, codes_cond)

    def f(t, u):
        return dyn.apply({"params": dyn_params}, t, u)
    codes = jnp.swapaxes(odeint_rk4(f, code0, t_grid), 0, 1)
    coords = make_coords(data.shape[2], data.shape[3])
    pred = _decode_batch(dec, dec_params, coords, codes, state_dim,
                         code_dim)
    mse = float(jnp.mean((pred - data) ** 2))
    return {"mse": mse, "pred": pred}


def eval_dino(dec, dyn, dec_params, dyn_params, data, t_grid, *,
              code_dim, state_dim=1, adapt_steps=100, adapt_lr=1e-2,
              n_cond_frames=1, mask=None, rng=None, return_codes=False,
              coords=None):
    """Test-time adaptation + forecast (DINo/utils.py:199-273): optimize a
    fresh latent code on the first `n_cond_frames` frames, roll out the code
    ODE, decode, and report in-t / out-t MSE."""
    data = jnp.asarray(data)
    N, T, H, W, S = data.shape
    coords = make_coords(H, W) if coords is None else jnp.asarray(coords)
    if mask is None:
        mask = jnp.ones((H, W), bool)

    codes0 = jnp.zeros((N, n_cond_frames, state_dim * code_dim))
    opt = optax.adam(adapt_lr)

    def fit_loss(codes):
        out = _decode_batch(dec, dec_params, coords, codes, state_dim,
                            code_dim)
        diff = (out - data[:, :n_cond_frames]) ** 2
        return jnp.mean(diff[:, :, mask, :])

    @jax.jit
    def adapt(codes):
        state = opt.init(codes)

        def body(i, carry):
            codes, state = carry
            g = jax.grad(fit_loss)(codes)
            up, state = opt.update(g, state)
            return optax.apply_updates(codes, up), state

        codes, _ = jax.lax.fori_loop(0, adapt_steps, body, (codes, state))
        return codes

    codes0 = adapt(codes0)

    def f(t, u):
        return dyn.apply({"params": dyn_params}, t, u)

    codes = odeint_rk4(f, codes0[:, 0], t_grid)  # (T, N, SC)
    codes = jnp.swapaxes(codes, 0, 1)
    pred = _decode_batch(dec, dec_params, coords, codes, state_dim, code_dim)
    mse = jnp.mean((pred - data) ** 2, axis=(0, 2, 3, 4))
    n_in = n_cond_frames
    out = {
        "mse": float(jnp.mean(mse)),
        "mse_in_t": float(jnp.mean(mse[:n_in])),
        "mse_out_t": float(jnp.mean(mse[n_in:])) if T > n_in else None,
        "pred": pred,
    }
    if return_codes:
        out["codes"] = codes0
    return out
