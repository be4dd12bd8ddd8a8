"""Feedforward CNN PPO on Minecraft2d — the reference's src/minecraft_cnn.py:
the whole (2, 84, 84) observation through one CNN, no LSTM.  (The
reference's policy-path /255 omission, minecraft_cnn.py:142, is a bug and is
not replicated — both heads see consistently scaled input.)

    python scripts/minecraft_cnn.py --num-envs 8
"""

import dataclasses

from _common import BasePPOArgs, field, ppo_config_from

from mmtrl_tpu.algos.ppo import make_ppo
from mmtrl_tpu.algos.ppo.runner import run_training
from mmtrl_tpu.core.config import cli
from mmtrl_tpu.envs import make
from mmtrl_tpu.models import CNNAgent


@dataclasses.dataclass
class Args(BasePPOArgs):
    exp_name: str = field("minecraft_cnn", "the name of this experiment")
    env_id: str = field("minecraft", "the id of the environment")
    num_envs: int = field(4, "parallel envs")


def main(args=None):
    args = args or cli(Args)
    env = make(args.env_id)
    cfg = ppo_config_from(args)
    model = CNNAgent(num_actions=env.num_actions, conv_type=args.conv_size, input_scale=args.input_scale)
    init_runner, train_iteration = make_ppo(env, model, cfg)
    return run_training(init_runner, train_iteration, cfg, args)


if __name__ == "__main__":
    main()
