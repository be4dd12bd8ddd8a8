"""C51 categorical DQN — the reference's cleanrl/c51.py / c51_jax.py.

    python scripts/c51.py --env-id CartPole-v1
"""

import dataclasses
from typing import Optional

from _common import field

from mmtrl_tpu.algos.offpolicy import C51Config, make_c51
from mmtrl_tpu.algos.offpolicy.runner import run_offpolicy
from mmtrl_tpu.core.config import cli
from mmtrl_tpu.envs import make
from mmtrl_tpu.models import DistributionalQNetwork


@dataclasses.dataclass
class Args:
    exp_name: str = field("c51", "the name of this experiment")
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
    n_atoms: int = field(101, "the number of atoms")
    v_min: float = field(-100.0, "the return lower bound")
    v_max: float = field(100.0, "the return upper bound")
    buffer_size: int = field(10000, "the replay memory buffer size")
    gamma: float = field(0.99, "the discount factor gamma")
    target_network_frequency: int = field(500, "target update interval (steps)")
    batch_size: int = field(128, "batch size from the replay memory")
    start_e: float = field(1.0, "the starting epsilon for exploration")
    end_e: float = field(0.05, "the ending epsilon for exploration")
    exploration_fraction: float = field(0.5, "fraction of timesteps for eps decay")
    learning_starts: int = field(10000, "timestep to start learning")
    train_frequency: int = field(10, "the frequency of training")
    steps_per_iteration: int = field(512, "env steps fused per jitted call")
    print_interval: int = field(1, "print stats every so iterations")
    save_interval: int = field(0, "save every n iterations (0: never)")
    save_dir: str = field("saved_agents", "checkpoint folder")
    load_from: str = field("", "checkpoint path from which to resume the run")
    platform: str = field("", "force the jax platform (e.g. 'cpu'); empty = default")


def main(args=None):
    args = args or cli(Args)
    env = make(args.env_id)
    cfg = C51Config(
        total_timesteps=args.total_timesteps,
        learning_rate=args.learning_rate,
        num_envs=args.num_envs,
        buffer_size=args.buffer_size,
        gamma=args.gamma,
        n_atoms=args.n_atoms,
        v_min=args.v_min,
        v_max=args.v_max,
        target_network_frequency=args.target_network_frequency,
        batch_size=args.batch_size,
        start_e=args.start_e,
        end_e=args.end_e,
        exploration_fraction=args.exploration_fraction,
        learning_starts=args.learning_starts,
        train_frequency=args.train_frequency,
        steps_per_iteration=args.steps_per_iteration,
    )
    model = DistributionalQNetwork(num_actions=env.num_actions, n_atoms=args.n_atoms)
    init_runner, train_iteration = make_c51(env, model, cfg)
    import jax.numpy as jnp

    atoms = jnp.linspace(args.v_min, args.v_max, args.n_atoms)

    def act(p, obs, key):
        pmf = model.apply(p, obs)  # (B, A, atoms)
        return jnp.argmax((pmf * atoms).sum(-1), axis=-1)

    eval_setup = (env, act, lambda ts: ts.params)
    return run_offpolicy(init_runner, train_iteration, cfg, args, eval_setup=eval_setup)


if __name__ == "__main__":
    main()
