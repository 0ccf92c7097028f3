"""DINo evaluation driver (reference: test_dino.py) — loads a checkpoint and
runs test-time latent adaptation + forecasting on fresh trajectories."""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from pde_policylearning_tpu.data.dino_datasets import (
    generate_navier_stokes_data, generate_wave_data)
from pde_policylearning_tpu.models.dino import Decoder, Derivative
from pde_policylearning_tpu.training import load_msgpack
from pde_policylearning_tpu.training.dino_train import eval_dino, init_dino


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-d", "--dataset", default="navier",
                        choices=["navier", "wave"])
    parser.add_argument("--ckpt", default="./outputs/dino.msgpack")
    parser.add_argument("--n_traj", type=int, default=8)
    parser.add_argument("--size", type=int, default=32)
    parser.add_argument("--n_frames", type=int, default=10)
    parser.add_argument("--code_dim", type=int, default=50)
    parser.add_argument("--hidden_c", type=int, default=64)
    parser.add_argument("--hidden_c_dyn", type=int, default=512)
    parser.add_argument("--seed", type=int, default=1)
    args = parser.parse_args()

    key = jax.random.PRNGKey(args.seed)
    gen = generate_navier_stokes_data if args.dataset == "navier" \
        else generate_wave_data
    data = gen(key, args.n_traj, args.size, args.n_frames)
    t_grid = jnp.linspace(0, 1.0, args.n_frames)

    dec = Decoder(state_c=1, hidden_c=args.hidden_c, code_c=args.code_dim,
                  coord_dim=2)
    dyn = Derivative(state_c=1, code_c=args.code_dim,
                     hidden_c=args.hidden_c_dyn)
    tmpl_dec, tmpl_dyn, _ = init_dino(dec, dyn, data.shape, args.code_dim,
                                      1, 2, jax.random.PRNGKey(0))
    ckpt = load_msgpack(args.ckpt, {"dec": tmpl_dec, "dyn": tmpl_dyn,
                                    "states_params": jnp.zeros((1,))})
    res = eval_dino(dec, dyn, ckpt["dec"], ckpt["dyn"], data, t_grid,
                    code_dim=args.code_dim, n_cond_frames=1)
    print(f"test: mse {res['mse']:.3e} in-t {res['mse_in_t']:.3e} "
          f"out-t {res['mse_out_t']:.3e}")


if __name__ == "__main__":
    from pde_policylearning_tpu.utils import apply_env_platform
    apply_env_platform()
    main()
