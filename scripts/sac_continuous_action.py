"""SAC — the reference's cleanrl/sac_continuous_action.py.

    python scripts/sac_continuous_action.py --env-id Pendulum-v1
"""

import dataclasses
from typing import Optional

from _common import field

from mmtrl_tpu.algos.offpolicy import SACConfig, make_sac
from mmtrl_tpu.algos.offpolicy.runner import run_offpolicy
from mmtrl_tpu.core.config import cli
from mmtrl_tpu.envs import make
from mmtrl_tpu.models import QFunction, SquashedGaussianActor


@dataclasses.dataclass
class Args:
    exp_name: str = field("sac_continuous_action", "the name of this experiment")
    seed: int = field(1, "seed of the experiment")
    torch_deterministic: bool = field(True, "CLI compat; no-op")
    cuda: bool = field(True, "CLI compat; no-op")
    track: bool = field(False, "CLI compat")
    wandb_project_name: str = field("cleanRL", "CLI compat")
    wandb_entity: Optional[str] = field(None, "CLI compat")
    capture_video: bool = field(False, "CLI compat")
    env_id: str = field("Pendulum-v1", "the id of the environment")
    total_timesteps: int = field(1000000, "total timesteps of the experiments")
    q_lr: float = field(1e-3, "critic learning rate")
    policy_lr: float = field(3e-4, "actor learning rate")
    num_envs: int = field(1, "the number of parallel game environments")
    buffer_size: int = field(131072, "the replay memory buffer size")
    gamma: float = field(0.99, "the discount factor gamma")
    tau: float = field(0.005, "target smoothing coefficient")
    batch_size: int = field(256, "batch size from the replay memory")
    learning_starts: int = field(5000, "timestep to start learning")
    policy_frequency: int = field(2, "actor update frequency")
    target_network_frequency: int = field(1, "target sync frequency")
    alpha: float = field(0.2, "entropy regularization coefficient")
    autotune: bool = field(True, "automatic alpha tuning")
    steps_per_iteration: int = field(512, "env steps fused per jitted call")
    print_interval: int = field(1, "print stats every so iterations")
    save_interval: int = field(0, "save every n iterations (0: never)")
    save_dir: str = field("saved_agents", "checkpoint folder")
    load_from: str = field("", "checkpoint path from which to resume the run")
    platform: str = field("", "force the jax platform (e.g. 'cpu'); empty = default")
    host_loop: bool = field(
        False,
        "step envs on host + updates on the accelerator (for remote-TPU "
        "setups where io_callback cannot cross the tunnel)",
    )
    chunk_size: int = field(64, "host-loop transitions per device dispatch")


def main(args=None):
    args = args or cli(Args)
    from mmtrl_tpu.envs.gym_bridge import GymPool, make_any

    if args.host_loop:
        # host-loop mode needs a real host env pool even for env ids that
        # also have a pure-JAX registry implementation.
        env = GymPool(args.env_id, args.num_envs, seed=args.seed)
    else:
        env, _ = make_any(args.env_id, num_envs=args.num_envs, seed=args.seed)
    cfg = SACConfig(
        total_timesteps=args.total_timesteps,
        q_lr=args.q_lr,
        policy_lr=args.policy_lr,
        num_envs=args.num_envs,
        buffer_size=args.buffer_size,
        gamma=args.gamma,
        tau=args.tau,
        batch_size=args.batch_size,
        learning_starts=args.learning_starts,
        policy_frequency=args.policy_frequency,
        target_network_frequency=args.target_network_frequency,
        alpha=args.alpha,
        autotune=args.autotune,
        steps_per_iteration=args.steps_per_iteration,
    )
    import numpy as np

    sp = env.action_space
    actor = SquashedGaussianActor(
        action_dim=sp.shape[0],
        action_scale=tuple(np.ravel((np.asarray(sp.high) - np.asarray(sp.low)) / 2.0)),
        action_bias=tuple(np.ravel((np.asarray(sp.high) + np.asarray(sp.low)) / 2.0)),
    )
    critic = QFunction()
    if args.host_loop:
        from mmtrl_tpu.algos.offpolicy.hostloop import run_offpolicy_hostloop

        return run_offpolicy_hostloop(make_sac, env, actor, critic, cfg, args)
    init_runner, train_iteration = make_sac(env, actor, critic, cfg)
    import jax.numpy as jnp

    scale = jnp.asarray((np.asarray(sp.high) - np.asarray(sp.low)) / 2.0)
    bias = jnp.asarray((np.asarray(sp.high) + np.asarray(sp.low)) / 2.0)

    def act(p, obs, key):
        mean, _ = actor.apply(p, obs)
        return jnp.tanh(mean) * scale + bias

    eval_setup = (env, act, lambda st: st.actor.params)
    return run_offpolicy(init_runner, train_iteration, cfg, args, eval_setup=eval_setup)


if __name__ == "__main__":
    main()
