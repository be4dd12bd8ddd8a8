"""PPO with a diagonal-Gaussian policy — the reference's
cleanrl/ppo_continuous_action.py surface on the device-resident Pendulum
(MuJoCo's C engine is host-bound; see envs/classic/pendulum.py).

    python scripts/ppo_continuous_action.py --env-id Pendulum-v1
"""

import dataclasses

from _common import BasePPOArgs, field, ppo_config_from

from mmtrl_tpu.algos.ppo import make_continuous_ppo
from mmtrl_tpu.algos.ppo.runner import run_training
from mmtrl_tpu.core.config import cli
from mmtrl_tpu.envs import make
from mmtrl_tpu.models import ContinuousActorCritic


@dataclasses.dataclass
class Args(BasePPOArgs):
    exp_name: str = field("ppo_continuous_action", "the name of this experiment")
    env_id: str = field("Pendulum-v1", "the id of the environment")
    total_timesteps: int = field(1000000, "total timesteps")
    learning_rate: float = field(3e-4, "learning rate")
    num_steps: int = field(2048, "rollout length")
    num_minibatches: int = field(32, "mini-batches")
    update_epochs: int = field(10, "update epochs")
    ent_coef: float = field(0.0, "entropy coefficient")
    clip_rewards: bool = field(False, "continuous control uses raw rewards")
    rpo_alpha: float = field(0.0, "RPO mean-perturbation radius (0 disables)")
    clip_action: bool = field(True, "clip actions to the action-space bounds")
    norm_obs: bool = field(True, "running mean/var observation normalization")
    norm_reward: bool = field(True, "discounted-return reward normalization")


def main(args=None):
    args = args or cli(Args)
    # Pure-JAX envs come from the registry; MuJoCo-class gymnasium ids
    # (HalfCheetah-v5, Hopper-v5, ...) go through the host bridge, which
    # applies the reference's literal gym wrapper stack per sub-env.
    from mmtrl_tpu.envs.gym_bridge import make_any

    env, is_bridge = make_any(
        args.env_id, num_envs=args.num_envs, seed=args.seed,
        wrap="ppo_continuous" if (args.norm_obs or args.norm_reward) else "none",
        gamma=args.gamma,
    )
    if not is_bridge:
        # Device-resident path: the functional wrapper stack
        # (cleanrl/ppo_continuous_action.py:90-94 equivalents).
        from mmtrl_tpu.envs.wrappers import (
            ClipAction, NormalizeObservation, NormalizeReward,
        )

        if args.clip_action:
            env = ClipAction(env)
        if args.norm_obs:
            env = NormalizeObservation(env)
        if args.norm_reward:
            env = NormalizeReward(env, gamma=args.gamma)
    cfg = ppo_config_from(args, rpo_alpha=args.rpo_alpha)
    model = ContinuousActorCritic(action_dim=env.action_space.shape[0])
    init_runner, train_iteration = make_continuous_ppo(env, model, cfg)
    import jax.numpy as jnp

    def video_policy(params, obs, done, carry, key):
        mean, _, _ = model.apply(params, obs)
        return mean, carry

    video_setup = (env, video_policy, lambda ts: ts.params, None) if args.capture_video else None
    return run_training(init_runner, train_iteration, cfg, args, video_setup=video_setup)


if __name__ == "__main__":
    main()
