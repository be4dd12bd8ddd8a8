"""PPO on classic control — the reference's cleanrl/ppo.py, TPU-native.

Same CLI, same hyperparameter defaults; the training loop is one jitted
scan-structured program per update (env rollout included) instead of a
host python loop.

    python scripts/ppo.py --env-id CartPole-v1 --total-timesteps 500000
"""

import dataclasses

from _common import BasePPOArgs, field, ppo_config_from

from mmtrl_tpu.algos.ppo import make_ppo
from mmtrl_tpu.algos.ppo.runner import run_training
from mmtrl_tpu.core.config import cli
from mmtrl_tpu.envs import make
from mmtrl_tpu.models import MLPActorCritic


@dataclasses.dataclass
class Args(BasePPOArgs):
    exp_name: str = field("ppo", "the name of this experiment")
    clip_rewards: bool = field(False, "classic control uses raw rewards")


def main(args=None):
    args = args or cli(Args)
    env = make(args.env_id)
    cfg = ppo_config_from(args)
    model = MLPActorCritic(num_actions=env.num_actions)
    init_runner, train_iteration = make_ppo(env, model, cfg)
    import jax.numpy as jnp

    def video_policy(params, obs, done, carry, key):
        logits, _ = model.apply(params, obs)
        return jnp.argmax(logits, axis=-1), carry

    video_setup = (env, video_policy, lambda ts: ts.params, None) if args.capture_video else None
    return run_training(init_runner, train_iteration, cfg, args, video_setup=video_setup)


if __name__ == "__main__":
    main()
