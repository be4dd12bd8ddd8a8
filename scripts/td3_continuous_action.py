"""TD3 — the reference's cleanrl/td3_continuous_action(_jax).py.

    python scripts/td3_continuous_action.py --env-id Pendulum-v1
"""

import dataclasses

import ddpg_continuous_action
from _common import field

from mmtrl_tpu.algos.offpolicy import TD3Config, make_td3
from mmtrl_tpu.algos.offpolicy.runner import run_offpolicy
from mmtrl_tpu.core.config import cli
from mmtrl_tpu.envs import make
from mmtrl_tpu.models import DeterministicActor, QFunction


@dataclasses.dataclass
class Args(ddpg_continuous_action.Args):
    exp_name: str = field("td3_continuous_action", "the name of this experiment")
    policy_noise: float = field(0.2, "target policy smoothing noise scale")
    noise_clip: float = field(0.5, "smoothing noise clip")


def main(args=None):
    args = args or cli(Args)
    from mmtrl_tpu.envs.gym_bridge import GymPool, make_any

    if args.host_loop:
        # host-loop mode needs a real host env pool even for env ids that
        # also have a pure-JAX registry implementation.
        env = GymPool(args.env_id, args.num_envs, seed=args.seed)
    else:
        env, _ = make_any(args.env_id, num_envs=args.num_envs, seed=args.seed)
    cfg = TD3Config(
        total_timesteps=args.total_timesteps,
        learning_rate=args.learning_rate,
        num_envs=args.num_envs,
        buffer_size=args.buffer_size,
        gamma=args.gamma,
        tau=args.tau,
        batch_size=args.batch_size,
        exploration_noise=args.exploration_noise,
        policy_noise=args.policy_noise,
        noise_clip=args.noise_clip,
        learning_starts=args.learning_starts,
        policy_frequency=args.policy_frequency,
        steps_per_iteration=args.steps_per_iteration,
    )
    import numpy as np

    sp = env.action_space
    actor = DeterministicActor(
        action_dim=sp.shape[0],
        action_scale=tuple(np.ravel((np.asarray(sp.high) - np.asarray(sp.low)) / 2.0)),
        action_bias=tuple(np.ravel((np.asarray(sp.high) + np.asarray(sp.low)) / 2.0)),
    )
    critic = QFunction()
    if args.host_loop:
        from mmtrl_tpu.algos.offpolicy.hostloop import run_offpolicy_hostloop

        return run_offpolicy_hostloop(make_td3, env, actor, critic, cfg, args)
    init_runner, train_iteration = make_td3(env, actor, critic, cfg)
    eval_setup = (
        env,
        lambda p, obs, key: actor.apply(p, obs),
        lambda st: st.actor.params,
    )
    return run_offpolicy(init_runner, train_iteration, cfg, args, eval_setup=eval_setup)


if __name__ == "__main__":
    main()
