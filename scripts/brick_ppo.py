"""PPO on BRICK — the in-repo Breakout-class homebrew cartridge.

BRICK (native/homebrew/brick.asm) is the repo's third real cartridge and
its Breakout analog: a destructible 4x16 brick wall held in RAM-backed
playfield bands, row-scored rewards (+2 top rows / +1 bottom rows), a
double-speed second wall, 3 lives.  The reference's Atari benchmark leg
names Breakout (cleanrl docs dqn_atari/ppo_atari); ale-py and its ROM set
are unreachable here, so BRICK supplies Breakout's task structure on a
real cartridge through the same native 2600 core + multimodal agent + PPO
trainer as SkelPlus.bin (reference benchmark config: Config.py:81-89).

    python scripts/brick_ppo.py --host-loop --num-envs 32 \
        --total-timesteps 1000000

Reward is the ALE-style score delta; clearing both walls (score 192) wins.
"""

import dataclasses

from _common import BasePPOArgs, field
from skeleton_plus_ppo import main as skeleton_main

from mmtrl_tpu.core.config import cli


@dataclasses.dataclass
class Args(BasePPOArgs):
    exp_name: str = field("brick_ppo", "the name of this experiment")
    env_id: str = field("brick_native", "the id of the environment")
    num_envs: int = field(32, "parallel emulated cartridges")
    clip_rewards: bool = field(False, "score deltas are already small ints")
    attn_type: str = field("casl", "crossmodal attention type")
    backend: str = field("native", "brick exists only as a real cartridge")
    rom_path: str = field(
        "", "cartridge path (default: native/homebrew/brick.bin)"
    )
    frameskip: int = field(8, "emulator frames per env step")
    reward_mode: str = field("score", "'score' (ALE delta) or 'win' (+5 bonus)")
    host_loop: bool = field(
        True,
        "host rollout loop (policy+update on the accelerator, emulation on "
        "host) — required where io_callback cannot cross the TPU tunnel",
    )
    eval_steps: int = field(
        4000, "greedy eval env-steps after host-loop training (0: skip)"
    )
    repeat_action_probability: float = field(
        0.0, "ALE-v5 sticky actions (reference envpool setting: 0.25)"
    )


def main(args=None):
    args = args or cli(Args)
    from mmtrl_tpu.envs.homebrew_native import BRICK_ROM

    if not args.rom_path:
        args.rom_path = BRICK_ROM
    return skeleton_main(args)


if __name__ == "__main__":
    main()
