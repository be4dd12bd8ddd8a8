"""Environment registry: `make(env_id)` like the reference's make_env thunks.

Keeps the reference's env ids (`minecraft` from src/train.py:49,
classic-control gym ids from cleanrl/ppo.py) so launch commands carry over.
"""

from __future__ import annotations

from typing import Callable, Dict

from mmtrl_tpu.envs.base import Environment

registry: Dict[str, Callable[..., Environment]] = {}


def register(*names: str):
    def deco(factory):
        for n in names:
            registry[n.lower()] = factory
        return factory

    return deco


def make(env_id: str, **kwargs) -> Environment:
    key = env_id.lower()
    if key not in registry:
        # Lazy-populate on first use.
        _populate()
    if key not in registry:
        raise KeyError(
            f"unknown env {env_id!r}; available: {sorted(registry)}"
        )
    return registry[key](**kwargs)


def _populate() -> None:
    from mmtrl_tpu.envs.classic import Acrobot, CartPole, MountainCar, Pendulum
    from mmtrl_tpu.envs.doorpuzzle import Doorpuzzle
    from mmtrl_tpu.envs.minecraft2d import Minecraft2d

    register("CartPole-v1", "CartPole")(CartPole)
    register("Acrobot-v1", "Acrobot")(Acrobot)
    register("MountainCar-v0", "MountainCar")(MountainCar)
    register("Pendulum-v1", "Pendulum")(Pendulum)
    register("minecraft", "Minecraft2d")(Minecraft2d)
    register("doorpuzzle", "Doorpuzzle")(Doorpuzzle)

    from mmtrl_tpu.envs.minecraft2d_ma import MultiAgentMinecraft2d
    from mmtrl_tpu.envs.skeleton_plus import SkeletonPlusSim

    register("minecraft_ma", "MultiAgentMinecraft2d")(MultiAgentMinecraft2d)
    register("skeleton_plus", "SkeletonPlus")(SkeletonPlusSim)

    from mmtrl_tpu.envs.skeleton_native import NativeSkeletonPlus

    # Runs the REAL SkelPlus.bin on the native 2600 core; requires
    # num_envs (and optionally rom_path/frameskip/...) kwargs.
    register("skeleton_plus_native")(NativeSkeletonPlus)

    from mmtrl_tpu.envs.homebrew_native import NativeBrick, NativeHomebrew

    # In-repo homebrew cartridges on the same native core (RL-ABI adapter,
    # native/atari/abi_env.cc); both are assembled from native/homebrew/.
    register("rally_native")(NativeHomebrew)
    register("brick_native")(NativeBrick)

    from mmtrl_tpu.envs.pong_ma import NativePong2P

    # TWO-PLAYER pong cartridge (both joysticks agent-driven) — the
    # multi-agent Atari leg (reference ppo_pettingzoo_ma_atari.py).
    register("pong_ma_native")(NativePong2P)

    from mmtrl_tpu.envs.procmaze import ProcMaze

    # Procgen-contract procedural distribution (num_levels/start_level
    # select the train window; see envs/procmaze.py).
    register("procmaze", "ProcMaze")(ProcMaze)
