"""Parameter-sharing multi-agent PPO — the reference's
cleanrl/ppo_pettingzoo_ma_atari.py structure on the device-resident
two-agent Minecraft2d: one shared policy batched over all agent slots, with
an agent-indicator observation channel (the SuperSuit agent_indicator
pattern, reference :150-159).

    python scripts/ppo_ma_minecraft.py --num-envs 4
"""

import dataclasses

from _common import BasePPOArgs, field, ppo_config_from

from mmtrl_tpu.algos.ppo import make_ppo
from mmtrl_tpu.algos.ppo.runner import run_training
from mmtrl_tpu.core.config import cli
from mmtrl_tpu.envs.minecraft2d_ma import NUM_AGENTS, MultiAgentMinecraft2d
from mmtrl_tpu.models import CNNAgent


@dataclasses.dataclass
class Args(BasePPOArgs):
    exp_name: str = field("ppo_ma_minecraft", "the name of this experiment")
    env_id: str = field("minecraft_ma", "the id of the environment")
    num_envs: int = field(4, "parallel JOINT envs (each holds 2 agent slots)")


def main(args=None):
    args = args or cli(Args)
    env = MultiAgentMinecraft2d()
    # Parameter sharing: the PPO batch dim is num_envs * num_agents slots.
    cfg = ppo_config_from(args, num_envs=args.num_envs * NUM_AGENTS)
    model = CNNAgent(num_actions=env.num_actions)
    init_runner, train_iteration = make_ppo(env, model, cfg)
    return run_training(init_runner, train_iteration, cfg, args)


if __name__ == "__main__":
    main()
