"""DDPG demo driver (reference: libs/ddpg/main_ddpg.py)."""
from pde_policylearning_tpu.control.ddpg import train_pendulum

if __name__ == "__main__":
    train_pendulum(episodes=20)
