"""DQN on classic control — the reference's cleanrl/dqn.py / dqn_jax.py.

    python scripts/dqn.py --env-id CartPole-v1 --total-timesteps 500000
"""

import dataclasses
from typing import Optional

from _common import field

from mmtrl_tpu.algos.offpolicy import DQNConfig, make_dqn
from mmtrl_tpu.algos.offpolicy.runner import run_offpolicy
from mmtrl_tpu.core.config import cli
from mmtrl_tpu.envs import make
from mmtrl_tpu.models import QNetwork


@dataclasses.dataclass
class Args:
    exp_name: str = field("dqn", "the name of this experiment")
    seed: int = field(1, "seed of the experiment")
    torch_deterministic: bool = field(True, "CLI compat; no-op")
    cuda: bool = field(True, "CLI compat; no-op")
    track: bool = field(False, "CLI compat")
    wandb_project_name: str = field("cleanRL", "CLI compat")
    wandb_entity: Optional[str] = field(None, "CLI compat")
    capture_video: bool = field(False, "CLI compat")
    env_id: str = field("CartPole-v1", "the id of the environment")
    total_timesteps: int = field(500000, "total timesteps of the experiments")
    learning_rate: float = field(2.5e-4, "the learning rate of the optimizer")
    num_envs: int = field(1, "the number of parallel game environments")
    buffer_size: int = field(10000, "the replay memory buffer size")
    gamma: float = field(0.99, "the discount factor gamma")
    tau: float = field(1.0, "the target network update rate")
    target_network_frequency: int = field(500, "target update interval (steps)")
    batch_size: int = field(128, "batch size from the replay memory")
    start_e: float = field(1.0, "the starting epsilon for exploration")
    end_e: float = field(0.05, "the ending epsilon for exploration")
    exploration_fraction: float = field(0.5, "fraction of timesteps for eps decay")
    learning_starts: int = field(10000, "timestep to start learning")
    train_frequency: int = field(10, "the frequency of training")
    steps_per_iteration: int = field(512, "env steps fused per jitted call")
    prioritized_replay: bool = field(False, "use prioritized experience replay")
    per_alpha: float = field(0.6, "PER priority exponent")
    per_beta_start: float = field(0.4, "PER IS-weight exponent (annealed to 1)")
    print_interval: int = field(1, "print stats every so iterations")
    save_interval: int = field(0, "save every n iterations (0: never)")
    save_dir: str = field("saved_agents", "checkpoint folder")
    load_from: str = field("", "checkpoint path from which to resume the run")
    platform: str = field("", "force the jax platform (e.g. 'cpu'); empty = default")


def main(args=None):
    args = args or cli(Args)
    env = make(args.env_id)
    cfg = DQNConfig(
        total_timesteps=args.total_timesteps,
        learning_rate=args.learning_rate,
        num_envs=args.num_envs,
        buffer_size=args.buffer_size,
        gamma=args.gamma,
        tau=args.tau,
        target_network_frequency=args.target_network_frequency,
        batch_size=args.batch_size,
        start_e=args.start_e,
        end_e=args.end_e,
        exploration_fraction=args.exploration_fraction,
        learning_starts=args.learning_starts,
        train_frequency=args.train_frequency,
        steps_per_iteration=args.steps_per_iteration,
        prioritized_replay=args.prioritized_replay,
        per_alpha=args.per_alpha,
        per_beta_start=args.per_beta_start,
    )
    model = QNetwork(num_actions=env.num_actions)
    init_runner, train_iteration = make_dqn(env, model, cfg)
    import jax.numpy as jnp

    eval_setup = (
        env,
        lambda p, obs, key: jnp.argmax(model.apply(p, obs), axis=-1),
        lambda ts: ts.params,
    )
    return run_offpolicy(init_runner, train_iteration, cfg, args, eval_setup=eval_setup)


if __name__ == "__main__":
    main()
