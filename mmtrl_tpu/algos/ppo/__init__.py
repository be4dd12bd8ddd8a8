from mmtrl_tpu.algos.ppo.core import (
    PPOConfig,
    make_ppo,
    make_recurrent_ppo,
    make_continuous_ppo,
)

__all__ = ["PPOConfig", "make_ppo", "make_recurrent_ppo", "make_continuous_ppo"]
