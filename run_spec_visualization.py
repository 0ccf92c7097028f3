"""Energy-spectrum comparison of model predictions vs ground truth.

reference: run_spec_visualization.py (broken in the reference — imports a
missing `utilities4`).  Computes radial energy spectra of the dataset's
v-planes and (optionally) a trained observer's predictions, and writes a
comparison plot.

Usage:
    python run_spec_visualization.py --data_folder ./data/... \
        [--ckpt outputs/model.msgpack --modes 12 --width 32] \
        [--out spectra.png]
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from pde_policylearning_tpu import models
from pde_policylearning_tpu.data import PDEDataset
from pde_policylearning_tpu.training import load_msgpack
from pde_policylearning_tpu.utils import spectrum2


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_folder", required=True)
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--modes", type=int, default=12)
    parser.add_argument("--width", type=int, default=32)
    parser.add_argument("--x_range", type=int, default=32)
    parser.add_argument("--y_range", type=int, default=32)
    parser.add_argument("--n_samples", type=int, default=64)
    parser.add_argument("--out", default="./outputs/spectra.png")
    args = parser.parse_args()

    total = len([f for f in os.listdir(args.data_folder)
                 if f.startswith("P_plane")])
    idx = np.arange(min(args.n_samples, total))
    ds = PDEDataset.from_folder(args.data_folder, idx,
                                x_range=args.x_range, y_range=args.y_range)
    x, y = ds.arrays()

    curves = {"ground truth": np.asarray(
        jnp.mean(spectrum2(ds.v_norm.decode(y[..., 0])), axis=0))}
    if args.ckpt:
        model = models.FNO2dObserver(modes1=args.modes, modes2=args.modes,
                                     width=args.width)
        tmpl = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])["params"]
        params = load_msgpack(args.ckpt, tmpl)
        pred = model.apply({"params": params}, x)[..., 0]
        curves["prediction"] = np.asarray(
            jnp.mean(spectrum2(ds.v_norm.decode(pred)), axis=0))

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(5, 4), dpi=100)
        for name, spec in curves.items():
            k = np.arange(1, len(spec) // 2)
            ax.loglog(k, spec[1:len(spec) // 2], label=name)
        ax.set_xlabel("wavenumber")
        ax.set_ylabel("E(k)")
        ax.legend()
        fig.savefig(args.out, bbox_inches="tight")
        print(f"saved {args.out}")
    except Exception as e:
        out_npz = args.out.rsplit(".", 1)[0] + ".npz"
        np.savez(out_npz, **curves)
        print(f"matplotlib unavailable ({e}); saved raw spectra {out_npz}")


if __name__ == "__main__":
    from pde_policylearning_tpu.utils import apply_env_platform
    apply_env_platform()
    main()
