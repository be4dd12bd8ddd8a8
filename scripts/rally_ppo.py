"""PPO on RALLY — the in-repo homebrew 2600 cartridge (real ROM training).

Rally (native/homebrew/rally.asm) is the repo's second cartridge: a
wall-ball game whose audio channel encodes ball height as pitch, so the
stereo-MFCC planes carry true state.  It runs on the same native 2600
core + multimodal agent + PPO trainer as the reference's SkelPlus.bin
(reference benchmark config: Config.py:81-89) — proving the stack is
game-general, not a single-ROM adapter.

    python scripts/rally_ppo.py --host-loop --num-envs 32 \
        --total-timesteps 1000000

Reward is the ALE-style score delta (+1 per paddle return; 21 wins).
"""

import dataclasses

from _common import BasePPOArgs, field
from skeleton_plus_ppo import main as skeleton_main

from mmtrl_tpu.core.config import cli


@dataclasses.dataclass
class Args(BasePPOArgs):
    exp_name: str = field("rally_ppo", "the name of this experiment")
    env_id: str = field("rally_native", "the id of the environment")
    num_envs: int = field(32, "parallel emulated cartridges")
    clip_rewards: bool = field(False, "score deltas are already unit-scale")
    attn_type: str = field("casl", "crossmodal attention type")
    backend: str = field("native", "rally exists only as a real cartridge")
    rom_path: str = field(
        "", "cartridge path (default: native/homebrew/rally.bin)"
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
    from mmtrl_tpu.envs.homebrew_native import RALLY_ROM

    if not args.rom_path:
        args.rom_path = RALLY_ROM
    return skeleton_main(args)


if __name__ == "__main__":
    main()
