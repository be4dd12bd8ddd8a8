"""DQN on a real 2600 cartridge — the reference's dqn_atari(_jax).py leg.

Trains the reference's DQN (Atari tower Q-network, epsilon-greedy, target
network; reference: cleanrl/dqn_atari_jax.py) on a REAL emulated cartridge
through the native 2600 core, via the host-loop split (emulation on the
host core, obs synthesis + acting + replay + TD updates in one jitted TPU
call per pool step — algos/offpolicy/hostloop_dqn.py).

Default cartridge: RALLY (native/homebrew/rally.asm, dense +1-per-return
score reward through the generic RL-ABI adapter).  SkelPlus.bin works too:

    python scripts/dqn_rom.py                      # RALLY
    python scripts/dqn_rom.py --env-id skeleton_plus_native \
        --reward-mode shaped                       # the reference benchmark ROM

Cadence mapping vs the reference's dqn_atari defaults (train_frequency=4,
batch 32 -> 8 replayed samples per env step; target sync every 1000 env
steps): with num_envs=8 pool envs, ``--train-frequency 2`` pool steps at
batch 128 replays 8 samples per env transition, and ``--target-network-
frequency 125`` pool steps syncs every 1000 transitions — ratio-identical.
Replay capacity is 100k int8-quantized transitions (~4.2 GB HBM; the
reference's 1M u8 frames don't fit next to the model on one chip, and a
1M-step run re-visits a 100k ring 10x — the standard small-replay regime).
"""

import dataclasses
from typing import Optional

from _common import field

from mmtrl_tpu.algos.offpolicy import DQNConfig
from mmtrl_tpu.algos.offpolicy.hostloop_dqn import run_dqn_hostloop
from mmtrl_tpu.core.config import cli
from mmtrl_tpu.models import QNetwork


@dataclasses.dataclass
class Args:
    exp_name: str = field("dqn_rom", "the name of this experiment")
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
    learning_rate: float = field(1e-4, "Adam lr (dqn_atari default)")
    num_envs: int = field(8, "parallel emulated cartridges")
    buffer_size: int = field(100000, "replay capacity (int8-quantized obs)")
    gamma: float = field(0.99, "discount")
    tau: float = field(1.0, "target update rate (1 = hard sync)")
    target_network_frequency: int = field(125, "target sync every n POOL steps")
    batch_size: int = field(128, "TD batch size")
    start_e: float = field(1.0, "starting epsilon")
    end_e: float = field(0.01, "final epsilon (dqn_atari default)")
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
    model = QNetwork(num_actions=env.num_actions, input_scale=1.0)
    try:
        return run_dqn_hostloop(
            env, model, cfg, args, eval_steps=args.eval_steps
        )
    finally:
        env.close()


if __name__ == "__main__":
    main()
