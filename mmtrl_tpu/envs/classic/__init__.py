from mmtrl_tpu.envs.classic.cartpole import CartPole
from mmtrl_tpu.envs.classic.acrobot import Acrobot
from mmtrl_tpu.envs.classic.mountain_car import MountainCar
from mmtrl_tpu.envs.classic.pendulum import Pendulum

__all__ = ["CartPole", "Acrobot", "MountainCar", "Pendulum"]
