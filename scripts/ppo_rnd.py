"""PPO + Random Network Distillation — the reference's
cleanrl/ppo_rnd_envpool.py on the device-resident envs.

    python scripts/ppo_rnd.py --env-id minecraft
"""

import dataclasses

from _common import BasePPOArgs, field

from mmtrl_tpu.algos.ppo.rnd import RNDAgent, RNDConfig, make_rnd_ppo
from mmtrl_tpu.algos.ppo.runner import run_training
from mmtrl_tpu.core.config import cli
from mmtrl_tpu.envs import make


@dataclasses.dataclass
class Args(BasePPOArgs):
    exp_name: str = field("ppo_rnd", "the name of this experiment")
    env_id: str = field("minecraft", "the id of the environment")
    num_envs: int = field(8, "parallel envs")
    int_coef: float = field(1.0, "intrinsic advantage coefficient")
    ext_coef: float = field(2.0, "extrinsic advantage coefficient")
    int_gamma: float = field(0.99, "intrinsic discount")
    update_proportion: float = field(0.25, "predictor batch fraction")


def main(args=None):
    args = args or cli(Args)
    env = make(args.env_id)
    cfg = RNDConfig(
        total_timesteps=args.total_timesteps,
        learning_rate=args.learning_rate,
        num_envs=args.num_envs,
        num_steps=args.num_steps,
        anneal_lr=args.anneal_lr,
        gamma=args.gamma,
        gae_lambda=args.gae_lambda,
        num_minibatches=args.num_minibatches,
        update_epochs=args.update_epochs,
        norm_adv=args.norm_adv,
        clip_coef=args.clip_coef,
        ent_coef=args.ent_coef,
        vf_coef=args.vf_coef,
        max_grad_norm=args.max_grad_norm,
        clip_rewards=args.clip_rewards,
        int_coef=args.int_coef,
        ext_coef=args.ext_coef,
        int_gamma=args.int_gamma,
        update_proportion=args.update_proportion,
    )
    model = RNDAgent(num_actions=env.num_actions)
    init_runner, train_iteration = make_rnd_ppo(env, model, cfg)
    return run_training(init_runner, train_iteration, cfg, args)


if __name__ == "__main__":
    main()
