"""Sigmoid-gated multimodal PPO-LSTM — the reference's
src/minecraft_lstm_attention.py: gate = sigmoid(MLP([v; a])), convex fusion
v*w + a*(1-w), and the scalar gate concatenated onto the LSTM output so the
actor/critic heads are 129-d (reference :59-104).

    python scripts/minecraft_lstm_attention.py --total-timesteps 100000
"""

import dataclasses

from _common import BasePPOArgs, field, ppo_config_from

from mmtrl_tpu.algos.ppo import make_recurrent_ppo
from mmtrl_tpu.algos.ppo.runner import run_training
from mmtrl_tpu.core.config import cli
from mmtrl_tpu.envs import make
from mmtrl_tpu.models import MultimodalRecurrentAgent


@dataclasses.dataclass
class Args(BasePPOArgs):
    exp_name: str = field("minecraft_lstm_attention", "the name of this experiment")
    env_id: str = field("minecraft", "the id of the environment")
    num_envs: int = field(1, "parallel envs (reference runs a single env)")
    num_minibatches: int = field(1, "mini-batches")
    update_epochs: int = field(1, "update epochs")


def main(args=None):
    args = args or cli(Args)
    env = make(args.env_id)
    cfg = ppo_config_from(args)
    model = MultimodalRecurrentAgent(
        num_actions=env.num_actions,
        conv_type=args.conv_size,
        attn_type="gate",
        fusion_type="sum",
        input_scale=args.input_scale,
    )
    init_runner, train_iteration = make_recurrent_ppo(env, model, cfg)
    return run_training(init_runner, train_iteration, cfg, args)


if __name__ == "__main__":
    main()
