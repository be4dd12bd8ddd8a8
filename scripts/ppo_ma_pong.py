"""Param-sharing multi-agent PPO on the REAL two-player PONG cartridge.

The reference's ppo_pettingzoo_ma_atari.py trains one shared policy over
both players of a 2-player Atari game (its example IS Pong, reference
:150-159).  This script is that leg on real cartridge dynamics: the
in-repo pong.asm runs on the native 2600 core with BOTH joysticks driven
by the shared recurrent multimodal agent (video + stereo-MFCC), via the
host rollout loop (emulation on host, policy+update on the accelerator).

Self-play notes: rewards are zero-sum (own − opponent score delta), so
the mean episodic return across slots is ≈0 by construction — the
learning curve to watch is ``charts/episodic_kills`` (mean points SCORED
per slot per episode: rallies + scoring both rise as play improves).
Match-play evidence against fixed opponents comes from
tools/eval_pong.py (policy vs noop / random / scripted ball-tracker).

    python scripts/ppo_ma_pong.py --num-envs 16 --total-timesteps 1000000
"""

import dataclasses

from _common import BasePPOArgs, field, ppo_config_from

from mmtrl_tpu.core.config import cli
from mmtrl_tpu.envs.pong_ma import NUM_AGENTS, PONG_ROM, NativePong2P
from mmtrl_tpu.models import MultimodalRecurrentAgent


@dataclasses.dataclass
class Args(BasePPOArgs):
    exp_name: str = field("ppo_ma_pong", "the name of this experiment")
    env_id: str = field("pong_ma_native", "the id of the environment")
    num_envs: int = field(16, "parallel JOINT cartridges (2 agent slots each)")
    clip_rewards: bool = field(False, "score deltas are already ±1")
    attn_type: str = field("casl", "crossmodal attention type")
    conv_size: str = field("small", "conv trunk size (host-loop recipe)")
    rom_path: str = field("", "cartridge path (default: native/homebrew/pong.bin)")
    frameskip: int = field(8, "emulator frames per env step")
    episode_steps: int = field(1500, "env-step episode cap per cartridge")
    repeat_action_probability: float = field(
        0.0, "ALE-v5 sticky actions per slot (reference envpool setting: 0.25)"
    )
    eval_steps: int = field(
        0,
        "greedy SELF-PLAY eval env-steps after training (0: skip — match "
        "evals vs fixed opponents live in tools/eval_pong.py)",
    )


def main(args=None):
    args = args or cli(Args)
    env = NativePong2P(
        num_envs=args.num_envs,
        rom_path=args.rom_path or PONG_ROM,
        seed=args.seed,
        frameskip=args.frameskip,
        episode_steps=args.episode_steps,
        repeat_action_probability=args.repeat_action_probability,
    )
    # Parameter sharing: the PPO batch dim is num_envs * 2 agent slots.
    cfg = ppo_config_from(args, num_envs=args.num_envs * NUM_AGENTS)
    model = MultimodalRecurrentAgent(
        num_actions=env.num_actions,
        conv_type=args.conv_size,
        attn_type=args.attn_type,
        fusion_type=args.fusion_type,
        input_scale=1.0,
    )
    from mmtrl_tpu.algos.ppo.hostloop import run_recurrent_ppo_hostloop

    return run_recurrent_ppo_hostloop(
        env, model, cfg, args, eval_steps=args.eval_steps
    )


if __name__ == "__main__":
    main()
