"""C51 on a real 2600 cartridge — the reference's c51_atari(_jax).py leg.

Trains the reference's categorical DQN (per-action distribution over a
fixed 51-atom support; reference: cleanrl/c51_atari_jax.py network +
projection at :219-239) on a REAL emulated cartridge through the native
2600 core.  The rollout/replay/update machinery is the shared host-loop
runner (algos/offpolicy/hostloop_dqn.py); only the two algorithm hooks
differ from DQN:

- acting: greedy over the EXPECTED Q — argmax_a sum_i p_i(s,a) * z_i;
- update: ``c51_td_update`` — the categorical projection + cross-entropy
  step, literally the same function the fused device path (algos/
  offpolicy/c51.py::make_c51) runs, so the math cannot diverge between
  the classic-control and ROM modes.

Cadence mapping vs the reference's c51_atari defaults (train_frequency=4,
batch 32 -> 8 replayed samples per env step; target sync every 10000 env
steps): with num_envs=8 pool envs, ``--train-frequency 2`` pool steps at
batch 128 replays 8 samples per env transition, and
``--target-network-frequency 1250`` pool steps syncs every 10000
transitions — ratio-identical.  The support defaults to the reference's
[-10, 10] x 51 (Atari clipped-reward convention; RALLY's sparse +1 score
rewards live in the same band).
"""

import dataclasses
from typing import Optional

import jax.numpy as jnp
import optax

from _common import field

from mmtrl_tpu.algos.offpolicy import DQNConfig
from mmtrl_tpu.algos.offpolicy.c51 import c51_td_update
from mmtrl_tpu.algos.offpolicy.hostloop_dqn import run_dqn_hostloop
from mmtrl_tpu.core.config import cli
from mmtrl_tpu.models import DistributionalQNetwork


@dataclasses.dataclass
class Args:
    exp_name: str = field("c51_rom", "the name of this experiment")
    seed: int = field(1, "seed of the experiment")
    torch_deterministic: bool = field(True, "CLI compat; no-op")
    cuda: bool = field(True, "CLI compat; no-op")
    track: bool = field(False, "CLI compat")
    wandb_project_name: str = field("cleanRL", "CLI compat")
    wandb_entity: Optional[str] = field(None, "CLI compat")
    capture_video: bool = field(False, "CLI compat")
    env_id: str = field("rally_native", "rally_native | brick_native | skeleton_plus_native")
    rom_path: str = field("", "cartridge path (default: per env-id)")
    frameskip: int = field(8, "emulator frames per env step")
    episode_steps: int = field(1500, "env-step cap per episode")
    reward_mode: str = field("score", "'score'/'win' (rally), 'shaped'/'kills' (skeleton)")
    repeat_action_probability: float = field(0.0, "ALE-v5 sticky actions (reference envpool setting: 0.25)")
    total_timesteps: int = field(1000000, "total env transitions")
    learning_rate: float = field(2.5e-4, "Adam lr (c51_atari default)")
    num_envs: int = field(8, "parallel emulated cartridges")
    buffer_size: int = field(100000, "replay capacity (int8-quantized obs)")
    gamma: float = field(0.99, "discount")
    tau: float = field(1.0, "target update rate (1 = hard sync)")
    target_network_frequency: int = field(1250, "target sync every n POOL steps")
    batch_size: int = field(128, "TD batch size")
    n_atoms: int = field(51, "support atoms (c51_atari default)")
    v_min: float = field(-10.0, "support lower bound")
    v_max: float = field(10.0, "support upper bound")
    start_e: float = field(1.0, "starting epsilon")
    end_e: float = field(0.01, "final epsilon (c51_atari default)")
    exploration_fraction: float = field(0.10, "fraction of steps for eps decay")
    learning_starts: int = field(20000, "env transitions before updates")
    train_frequency: int = field(2, "TD update every n POOL steps")
    eval_steps: int = field(4000, "greedy eval POOL steps after training, floored at the episode cap (0: skip)")
    print_interval: int = field(1, "print every n*50 pool steps")
    save_interval: int = field(0, "save train state every n*50 pool steps (0: never)")
    save_dir: str = field("saved_agents", "checkpoint folder")
    load_from: str = field(
        "",
        "resume: restore the train state (params+target+opt) from a saved "
        "run; the replay ring restarts cold and refills at epsilon=end_e "
        "before updates resume (hostloop_dqn.py resume semantics)",
    )


def main(args=None):
    args = args or cli(Args)
    if args.load_from:
        # Resumed behavior acts at the final epsilon while the cold replay
        # ring refills — not a re-exploration from start_e.
        args.start_e = args.end_e
    from mmtrl_tpu.envs.homebrew_native import make_native_env

    env = make_native_env(
        args.env_id,
        num_envs=args.num_envs,
        rom_path=args.rom_path,
        seed=args.seed,
        frameskip=args.frameskip,
        episode_steps=args.episode_steps,
        reward_mode=args.reward_mode,
        repeat_action_probability=args.repeat_action_probability,
    )

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
    )
    # Native obs are already normalized to [-1, 1] (no /255).
    model = DistributionalQNetwork(
        num_actions=env.num_actions, n_atoms=args.n_atoms, input_scale=1.0
    )
    atoms = jnp.linspace(args.v_min, args.v_max, args.n_atoms)

    def greedy_fn(params, obs):
        pmfs = model.apply(params, obs)  # (N, A, n_atoms)
        return jnp.argmax((pmfs * atoms).sum(axis=-1), axis=-1)

    def update_fn(ts, batch):
        return c51_td_update(model, atoms, cfg.gamma, ts, batch)

    try:
        return run_dqn_hostloop(
            env,
            model,
            cfg,
            args,
            eval_steps=args.eval_steps,
            greedy_fn=greedy_fn,
            update_fn=update_fn,
            # c51_jax's Adam epsilon convention (0.01 / batch_size).
            tx=optax.adam(args.learning_rate, eps=0.01 / args.batch_size),
        )
    finally:
        env.close()


if __name__ == "__main__":
    main()
