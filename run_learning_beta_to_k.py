"""Learn PDE-backstepping gain kernels beta -> k with a DeepONet.

reference: run_learning_beta_to_k.ipynb — trains deepxde's
DeepONetCartesianProd on (beta, k) pairs for the reaction-diffusion
backstepping problem u_t = u_xx + beta u.

Data: for constant beta = lambda the backstepping kernel has the closed
form (Krstic & Smyshlyaev, 2008)
    k(x, y) = -lambda * y * I1(z) / z,   z = sqrt(lambda (x^2 - y^2))
on the triangle 0 <= y <= x <= 1.  Random lambdas give the training set;
the DeepONet maps the sensor values of beta to k on the grid.

Usage: python run_learning_beta_to_k.py [--iters 2000]
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pde_policylearning_tpu.models.deeponet import DeepONetCartesianProd


def bessel_i1_over_z(z):
    """I1(z)/z via the power series (converges fast for z < ~30)."""
    z = np.asarray(z, np.float64)
    out = np.zeros_like(z)
    term = np.ones_like(z) * 0.5  # m=0 term of I1(z)/z = 1/2 sum ...
    out += term
    z2 = (z / 2) ** 2
    for m in range(1, 25):
        term = term * z2 / (m * (m + 1))
        out += term
    return out


def backstepping_kernel(lam, X, Y):
    """k(x,y) for constant beta=lam on the grid."""
    arg = lam * (X ** 2 - Y ** 2)
    z = np.sqrt(np.clip(arg, 0, None))
    return -lam * Y * bessel_i1_over_z(z)


def make_dataset(n_samples, n_grid, rng):
    lams = rng.uniform(1.0, 15.0, n_samples)
    xs = np.linspace(0, 1, n_grid)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    tri = Y <= X
    coords = np.stack([X[tri], Y[tri]], axis=-1)      # (N_pts, 2)
    betas = np.repeat(lams[:, None], n_grid, axis=1)  # sensors (constant)
    ks = np.stack([backstepping_kernel(l, X, Y)[tri] for l in lams])
    return (jnp.asarray(betas, jnp.float32), jnp.asarray(coords, jnp.float32),
            jnp.asarray(ks, jnp.float32))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=2000)
    parser.add_argument("--n_train", type=int, default=200)
    parser.add_argument("--n_test", type=int, default=40)
    parser.add_argument("--n_grid", type=int, default=24)
    parser.add_argument("--latent", type=int, default=64)
    args = parser.parse_args()

    rng = np.random.default_rng(0)
    b_tr, coords, k_tr = make_dataset(args.n_train, args.n_grid, rng)
    b_ts, _, k_ts = make_dataset(args.n_test, args.n_grid, rng)

    model = DeepONetCartesianProd(
        branch_layers=(128, 128, args.latent),
        trunk_layers=(128, 128, args.latent))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), b_tr[:1],
                                 coords)["params"]
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, b, k):
        def loss_fn(p):
            pred = model.apply({"params": p}, b, coords)
            return jnp.mean((pred - k) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(args.iters):
        params, opt_state, loss = step(params, opt_state, b_tr, k_tr)
        if (i + 1) % max(1, args.iters // 5) == 0:
            pred = model.apply({"params": params}, b_ts, coords)
            rel = float(jnp.linalg.norm(pred - k_ts)
                        / jnp.linalg.norm(k_ts))
            print(f"iter {i + 1}: train MSE {float(loss):.4e}, "
                  f"test rel-L2 {rel:.4f}")
    return params


if __name__ == "__main__":
    from pde_policylearning_tpu.utils import apply_env_platform
    apply_env_platform()
    main()
