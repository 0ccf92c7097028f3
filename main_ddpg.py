"""DDPG demo driver (reference: libs/ddpg/main_ddpg.py)."""
from pde_policylearning_tpu.control.ddpg import train_pendulum

if __name__ == "__main__":
    from pde_policylearning_tpu.utils import apply_env_platform
    apply_env_platform()
    train_pendulum(episodes=20)
