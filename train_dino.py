"""DINo training driver.

reference: train_dino.py (getopt CLI, -d dataset -r subsampling).  Trains
the INR decoder + latent dynamics on on-the-fly wave / Navier-Stokes
trajectories and reports in-t / out-t forecast MSE.

Usage:
    python train_dino.py -d navier -r 1.0 [--epochs N]
"""
from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from pde_policylearning_tpu.data.dino_datasets import (generate_mask,
                                                       generate_navier_stokes_data,
                                                       generate_wave_data)
from pde_policylearning_tpu.models.dino import Decoder, Derivative
from pde_policylearning_tpu.training import save_msgpack
from pde_policylearning_tpu.training.dino_train import eval_dino, train_dino


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-d", "--dataset", default="navier",
                        choices=["navier", "wave", "shallow_water"])
    parser.add_argument("-r", "--subsampling", type=float, default=1.0,
                        help="fraction of grid points observed")
    parser.add_argument("--epochs", type=int, default=200)
    parser.add_argument("--n_traj", type=int, default=64)
    parser.add_argument("--size", type=int, default=32)
    parser.add_argument("--n_frames", type=int, default=10)
    parser.add_argument("--code_dim", type=int, default=50)
    parser.add_argument("--hidden_c", type=int, default=64)
    parser.add_argument("--hidden_c_dyn", type=int, default=512)
    parser.add_argument("--lr", type=float, default=1e-2)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out", default="./outputs/dino.msgpack")
    args = parser.parse_args()

    key = jax.random.PRNGKey(args.seed)
    kd, km, kt = jax.random.split(key, 3)
    coords = None
    state_c = 1
    if args.dataset == "navier":
        data = generate_navier_stokes_data(kd, args.n_traj, args.size,
                                           args.n_frames)
        t_total = 1.0
    elif args.dataset == "wave":
        data = generate_wave_data(kd, args.n_traj, args.size, args.n_frames)
        t_total = 1.0
    else:  # spherical SWE (DINo data_pdes.py ShallowWaterDataset)
        from pde_policylearning_tpu.data.dino_datasets import \
            ShallowWaterDataset
        ds = ShallowWaterDataset(args.n_traj, args.n_frames,
                                 nlat=args.size, nlon=2 * args.size)
        data, coords = ds.arrays()
        state_c = 2
        t_total = 1.0

    import jax.numpy as jnp
    t_grid = jnp.linspace(0, t_total, args.n_frames)
    mask_frac = max(0.0, 1.0 - args.subsampling)
    mask = generate_mask(km, data.shape[2], data.shape[3], mask_frac)

    dec = Decoder(state_c=state_c, hidden_c=args.hidden_c,
                  code_c=args.code_dim,
                  coord_dim=2 if coords is None else coords.shape[-1])
    dyn = Derivative(state_c=state_c, code_c=args.code_dim,
                     hidden_c=args.hidden_c_dyn)
    dec_p, dyn_p, states, hist = train_dino(
        dec, dyn, data, t_grid, code_dim=args.code_dim, state_dim=state_c,
        n_epochs=args.epochs, lr=args.lr, mask=mask, rng=kt, coords=coords)

    result = eval_dino(dec, dyn, dec_p, dyn_p, data[:8], t_grid,
                       code_dim=args.code_dim, state_dim=state_c,
                       n_cond_frames=1, coords=coords)
    print(f"eval: mse {result['mse']:.3e} in-t {result['mse_in_t']:.3e} "
          f"out-t {result['mse_out_t']:.3e}")

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    save_msgpack(args.out, {"dec": dec_p, "dyn": dyn_p,
                            "states_params": states})
    print(f"saved {args.out}")


if __name__ == "__main__":
    from pde_policylearning_tpu.utils import apply_env_platform
    apply_env_platform()
    main()
