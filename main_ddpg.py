"""DDPG drivers (reference: libs/ddpg/main_ddpg.py).

The reference ships DDPG as a standalone Pendulum demo only.  This driver
keeps that demo (default) and adds the channel-DNS mode the reference
scaffolded but never wired: a fully on-device DDPG loop on the turbulent
channel (rollout + replay + updates inside one lax.scan; see
control/ddpg.py:train_ddpg_channel_on_device).

Usage:
    python main_ddpg.py                  # Pendulum demo (reference parity)
    python main_ddpg.py --channel        # DDPG on the channel DNS
"""
import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--channel", action="store_true",
                    help="train on the channel DNS (on-device loop)")
    ap.add_argument("--episodes", type=int, default=20)
    ap.add_argument("--n_steps", type=int, default=8192)
    ap.add_argument("--warmup", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="./outputs/ddpg_channel_actor.msgpack")
    args = ap.parse_args()

    if not args.channel:
        from pde_policylearning_tpu.control.ddpg import train_pendulum
        train_pendulum(episodes=args.episodes)
        return

    from pde_policylearning_tpu.control.ddpg import \
        train_ddpg_channel_on_device
    from pde_policylearning_tpu.training import save_msgpack
    actor_params, metrics = train_ddpg_channel_on_device(
        n_steps=args.n_steps, warmup=args.warmup, seed=args.seed)
    save_msgpack(args.out, actor_params)
    print(f"Actor saved at {args.out}")
    base = metrics["warmup_shear"].mean()
    tail = metrics["shear"][-max(1, args.n_steps // 4):].mean()
    print(f"warmup mean shear {base:.6e} -> last-quarter mean {tail:.6e} "
          f"({100 * (tail - base) / base:+.2f}%)")


if __name__ == "__main__":
    from pde_policylearning_tpu.utils import apply_env_platform
    apply_env_platform()
    main()
