from mmtrl_tpu.algos.offpolicy.dqn import DQNConfig, make_dqn
from mmtrl_tpu.algos.offpolicy.c51 import C51Config, make_c51
from mmtrl_tpu.algos.offpolicy.ddpg import DDPGConfig, make_ddpg
from mmtrl_tpu.algos.offpolicy.td3 import TD3Config, make_td3
from mmtrl_tpu.algos.offpolicy.sac import SACConfig, make_sac

__all__ = [
    "DQNConfig",
    "make_dqn",
    "C51Config",
    "make_c51",
    "DDPGConfig",
    "make_ddpg",
    "TD3Config",
    "make_td3",
    "SACConfig",
    "make_sac",
]
