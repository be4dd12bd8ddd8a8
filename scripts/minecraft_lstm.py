"""Multimodal / single-tower PPO-LSTM on Minecraft2d — the reference's
src/minecraft_lstm.py (vectorized runner choosing MinecraftAgent or the
single-tower OldAgent, reference :82-91).

    python scripts/minecraft_lstm.py --num-envs 8 --agent minecraft
"""

import dataclasses

from _common import BasePPOArgs, field, ppo_config_from

from mmtrl_tpu.algos.ppo import make_recurrent_ppo
from mmtrl_tpu.algos.ppo.runner import run_training
from mmtrl_tpu.core.config import cli
from mmtrl_tpu.envs import make
from mmtrl_tpu.models import MultimodalRecurrentAgent, RecurrentAgent


@dataclasses.dataclass
class Args(BasePPOArgs):
    exp_name: str = field("minecraft_lstm", "the name of this experiment")
    env_id: str = field("minecraft", "the id of the environment")
    agent: str = field("minecraft", "'minecraft' (two-tower) or 'old' (single-tower)")
    num_envs: int = field(4, "parallel envs")
    num_minibatches: int = field(1, "mini-batches")
    update_epochs: int = field(1, "update epochs")


def main(args=None):
    args = args or cli(Args)
    if args.agent == "old":
        env = make(args.env_id, use_audio=False)
        model = RecurrentAgent(num_actions=env.num_actions, conv_type=args.conv_size, input_scale=args.input_scale)
    else:
        env = make(args.env_id)
        model = MultimodalRecurrentAgent(
            num_actions=env.num_actions,
            conv_type=args.conv_size,
            attn_type=args.attn_type,
            fusion_type=args.fusion_type,
            input_scale=args.input_scale,
        )
    cfg = ppo_config_from(args)
    init_runner, train_iteration = make_recurrent_ppo(env, model, cfg)
    return run_training(init_runner, train_iteration, cfg, args)


if __name__ == "__main__":
    main()
