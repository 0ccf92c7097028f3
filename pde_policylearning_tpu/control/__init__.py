from .gym_env import ChannelGymEnv, train_ddpg_channel
from .loop import closed_loop_chunk, run_closed_loop
from .policies import (StatefulPolicy, make_fullfield_optimal_observer,
                       make_optimal_policy_observer, make_policy)

__all__ = ["closed_loop_chunk", "run_closed_loop", "make_policy",
           "StatefulPolicy", "make_optimal_policy_observer",
           "make_fullfield_optimal_observer",
           "ChannelGymEnv", "train_ddpg_channel"]
