"""DDPG — the reference's cleanrl/ddpg_continuous_action(_jax).py on the
device-resident Pendulum.

    python scripts/ddpg_continuous_action.py --env-id Pendulum-v1
"""

import dataclasses
from typing import Optional

from _common import field

from mmtrl_tpu.algos.offpolicy import DDPGConfig, make_ddpg
from mmtrl_tpu.algos.offpolicy.runner import run_offpolicy
from mmtrl_tpu.core.config import cli
from mmtrl_tpu.envs import make
from mmtrl_tpu.models import DeterministicActor, QFunction


@dataclasses.dataclass
class Args:
    exp_name: str = field("ddpg_continuous_action", "the name of this experiment")
    seed: int = field(1, "seed of the experiment")
    torch_deterministic: bool = field(True, "CLI compat; no-op")
    cuda: bool = field(True, "CLI compat; no-op")
    track: bool = field(False, "CLI compat")
    wandb_project_name: str = field("cleanRL", "CLI compat")
    wandb_entity: Optional[str] = field(None, "CLI compat")
    capture_video: bool = field(False, "CLI compat")
    env_id: str = field("Pendulum-v1", "the id of the environment")
    total_timesteps: int = field(1000000, "total timesteps of the experiments")
    learning_rate: float = field(3e-4, "the learning rate of the optimizer")
    num_envs: int = field(1, "the number of parallel game environments")
    buffer_size: int = field(131072, "the replay memory buffer size")
    gamma: float = field(0.99, "the discount factor gamma")
    tau: float = field(0.005, "target smoothing coefficient")
    batch_size: int = field(256, "batch size from the replay memory")
    exploration_noise: float = field(0.1, "the scale of exploration noise")
    learning_starts: int = field(25000, "timestep to start learning")
    policy_frequency: int = field(2, "delayed policy update frequency")
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
    cfg = DDPGConfig(
        total_timesteps=args.total_timesteps,
        learning_rate=args.learning_rate,
        num_envs=args.num_envs,
        buffer_size=args.buffer_size,
        gamma=args.gamma,
        tau=args.tau,
        batch_size=args.batch_size,
        exploration_noise=args.exploration_noise,
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

        return run_offpolicy_hostloop(make_ddpg, env, actor, critic, cfg, args)
    init_runner, train_iteration = make_ddpg(env, actor, critic, cfg)
    eval_setup = (
        env,
        lambda p, obs, key: actor.apply(p, obs),
        lambda st: st.actor.params,
    )
    return run_offpolicy(init_runner, train_iteration, cfg, args, eval_setup=eval_setup)


if __name__ == "__main__":
    main()
