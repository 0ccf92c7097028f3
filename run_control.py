"""Closed-loop control driver.

reference: run_control.py:26 (run_control).  Runs a control policy against
the channel-flow DNS env and reports the drag-reduction scoreboard.

Usage:
    python run_control.py --control_yaml configs/base_control.yaml
"""
from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from pde_policylearning_tpu import models
from pde_policylearning_tpu.control import make_policy, run_closed_loop
from pde_policylearning_tpu.data import PDEDataset
from pde_policylearning_tpu.envs import NSControlEnv
from pde_policylearning_tpu.training import load_msgpack
from pde_policylearning_tpu.utils import default_parser, load_yaml, \
    merge_args_with_yaml


def run_control(args, observer_model=None, observer_params=None,
                train_dataset=None, policy_model=None):
    if args.get("env_name", "NSControlEnvMatlab") == "NSControlEnv2D":
        return run_control_2d(args)
    env = NSControlEnv(
        Re=float(args.get("Re", -1)),
        detect_plane=int(args.get("detect_plane", 25)),
        test_plane=int(args.get("test_plane", 124)),
        noise_scale=float(args.get("init_noise_scale", 0.05)),
        seed=int(args.get("seed", 0)),
        spinup_steps=int(args.get("spinup_steps", 0)),
    )
    print("Environment is initialized!")

    policy_name = args.policy_name
    pkw = {}
    if policy_name in ("fno", "rno", "transformer") \
            and train_dataset is not None:
        pkw = {"model": observer_model, "params": observer_params,
               "p_norm": train_dataset.p_norm, "v_norm": train_dataset.v_norm,
               "model_timestep": int(args.get("model_timestep", 1)),
               "action_scale": float(args.get("action_scale", 0.3)),
               "action_clip": args.get("action_clip", 0.01)}
    elif policy_name == "optimal-observer":
        pkw = {"model": observer_model, "params": observer_params,
               "bound_v_norm": getattr(train_dataset, "bound_v_norm", None),
               "opt_steps": int(args.get("opt_steps", 10))}
    policy_fn = make_policy(
        policy_name, env.grid,
        detect_plane=int(args.get("detect_plane", 25)),
        rand_scale=float(args.get("rand_scale", 1.0)), **pkw)

    result = run_closed_loop(
        env, policy_fn,
        n_steps=int(args.get("control_timestep", 2000)),
        log_interval=int(args.get("log_interval", 200)),
        collect_planes=bool(args.get("collect_data", False)),
        detect_plane=int(args.get("detect_plane", 25)),
        seed=int(args.get("seed", 0)))

    series = result["series"]
    ss = series["drag_reduction/1_shear_stress"]
    rel = series.get("drag_reduction_relative/1_shear_stress")
    print(f"Final shear stress: {ss[-1]:.6f} (initial {ss[0]:.6f})")
    if rel is not None:
        print(f"Relative shear stress vs init: {rel[-1]:.4f}")

    if args.get("collect_data", False):
        from pde_policylearning_tpu.control.loop import \
            save_collected_dataset
        out_dir = os.path.join(args.get("output_dir", "./outputs"),
                               args.get("exp_name", "control"))
        os.makedirs(out_dir, exist_ok=True)
        np.savez(os.path.join(out_dir, "control_series.npz"), **series)
        np.save(os.path.join(out_dir, "opV2.npy"), result["opV2"])
        save_collected_dataset(result, out_dir)
        print(f"Collected data saved under {out_dir} "
              "(trainable P_planes/V_planes + metadata)")
    return result


def run_control_2d(args):
    """2-D env control loop (run_control.py env_name='NSControlEnv2D')."""
    from pde_policylearning_tpu.envs import NSControlEnv2D
    env = NSControlEnv2D(
        detect_plane=int(args.get("detect_plane", -10)),
        bc_type=args.get("bc_type", "original"),
        Re=float(args.get("Re", 100.0)) if float(args.get("Re", -1)) > 0
        else 100.0,
        fix_flow=bool(args.get("fix_flow", False)))
    n_steps = int(args.get("control_timestep", 100))
    policy = args.get("policy_name", "unmanipulated")
    series = []
    for i in range(n_steps):
        if policy == "gt":
            bc = env.gt_control()
        else:
            bc = None
        p_top, div, done, info = env.step(bc)
        series.append(info)
        if (i + 1) % max(1, n_steps // 5) == 0:
            print(f"step {i + 1}/{n_steps}: shear "
                  f"{info['drag_reduction/1_shear_stress']:.5f}")
    return {"series": {k: np.asarray([s[k] for s in series])
                       for k in series[0]}}


def main():
    parser = default_parser()
    parser.add_argument("--policy_name", type=str, default=None)
    cli = parser.parse_args()
    args = merge_args_with_yaml(cli, load_yaml(cli.control_yaml))
    if cli.policy_name:
        args.policy_name = cli.policy_name

    observer_model, observer_params, train_dataset = None, None, None
    if args.policy_name in ("fno", "rno", "transformer",
                            "optimal-observer"):
        if args.policy_name in ("fno", "optimal-observer"):
            observer_model = models.FNO2dObserver(
                modes1=args.modes, modes2=args.modes, width=args.width)
        elif args.policy_name == "transformer":
            observer_model = models.SimpleTransformer(
                n_hidden=int(args.get("n_hidden", 96)),
                n_head=int(args.get("n_head", 2)),
                attention_type=args.get("attention_type", "fourier"),
                freq_dim=int(args.get("freq_dim", 48)),
                fourier_modes=int(args.get("modes", 12)))
        else:
            observer_model = models.RNO2dObserver(
                modes1=args.modes, modes2=args.modes, width=args.width,
                layer_num=int(args.get("layer_num", 1)))
        ckpt = args.get("model_checkpoint")
        if ckpt:
            import jax
            import jax.numpy as jnp
            Nx = int(args.get("x_range", 32))
            Nz = int(args.get("y_range", 32))
            if args.policy_name in ("fno", "optimal-observer"):
                x0 = jnp.zeros((1, Nx, Nz, 1))
            else:  # rno / transformer consume sequences
                x0 = jnp.zeros((1, int(args.get("model_timestep", 2)),
                                Nx, Nz, 1))
            # template load so legacy dense-weight layouts are adapted
            tmpl = jax.jit(observer_model.init)(
                jax.random.PRNGKey(0), x0)["params"]
            observer_params = load_msgpack(ckpt, tmpl)
        total = len([f for f in os.listdir(args.DATA_FOLDER)
                     if f.startswith("P_plane")])
        train_dataset = PDEDataset.from_folder(
            args.DATA_FOLDER, np.arange(min(100, total)),
            downsample_rate=int(args.get("downsample_rate", 1)),
            x_range=int(args.get("x_range", 32)),
            y_range=int(args.get("y_range", 32)))
    run_control(args, observer_model, observer_params, train_dataset)


if __name__ == "__main__":
    from pde_policylearning_tpu.utils import apply_env_platform
    apply_env_platform()
    main()
