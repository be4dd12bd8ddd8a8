from mmtrl_tpu.envs.base import Environment, EnvParams, TimeStep
from mmtrl_tpu.envs.registry import make, registry
from mmtrl_tpu.envs import spaces

__all__ = ["Environment", "EnvParams", "TimeStep", "make", "registry", "spaces"]
