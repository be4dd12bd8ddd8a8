"""Multimodal PPO-LSTM on Minecraft2d — the reference's src/train.py.

Same CLI (--attn-type casl|new, --fusion-type sum|concat, --conv-size
big|small, checkpoint flags).  The agent is the two-tower crossmodal
MinecraftAgent; rollout + GAE + sequence-preserving minibatch update run as
one jitted program per update.

    python scripts/train.py --env-id minecraft --attn-type casl --fusion-type sum
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
    exp_name: str = field("train", "the name of this experiment")
    env_id: str = field("minecraft", "the id of the environment")
    num_envs: int = field(1, "parallel envs (reference default, src/utils.py:74)")
    num_minibatches: int = field(1, "mini-batches (reference default)")
    update_epochs: int = field(1, "update epochs (reference default)")


def main(args=None):
    args = args or cli(Args)
    env = make(args.env_id)
    cfg = ppo_config_from(args)
    model = MultimodalRecurrentAgent(
        num_actions=env.num_actions,
        conv_type=args.conv_size,
        attn_type=args.attn_type,
        fusion_type=args.fusion_type,
        input_scale=args.input_scale,
    )
    init_runner, train_iteration = make_recurrent_ppo(env, model, cfg)

    import jax.numpy as jnp

    def video_policy(params, obs, done, carry, key):
        logits, _, carry = model.apply(params, obs[None], done[None], carry)
        return jnp.argmax(logits[0], axis=-1), carry

    video_setup = (
        env, video_policy, lambda ts: ts.params, model.initial_carry(1)
    ) if args.capture_video else None
    return run_training(init_runner, train_iteration, cfg, args, video_setup=video_setup)


if __name__ == "__main__":
    main()
