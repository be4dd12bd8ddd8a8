"""RL envs over in-repo homebrew 2600 cartridges (native/homebrew/*).

The reference ships a single cartridge (SkelPlus.bin) and treats it as a
benchmark env through ALE with a stereo-audio tap (Config.py:81-89).  The
in-repo 2600 core is game-GENERAL; this module runs cartridges we author
ourselves (assembled by tools/asm6502.py) through the generic RL-ABI
adapter (native/atari/abi_env.cc: $80 score / $81 lives / $82 status).

Cartridges:
- RALLY (native/homebrew/rally.asm) — a wall-ball game whose audio
  channel 0 continuously encodes the ball height as pitch, so the
  stereo-MFCC observation planes carry true game state, exercising the
  same multimodal pipeline as Skeleton+ (video + stereo MFCC -> (3,84,84)).
- BRICK (native/homebrew/brick.asm) — a Breakout-class game (4x16
  destructible brick wall in RAM-backed playfield bands, row-scored
  +2/+1, double-speed second wall) standing in for the reference's
  Breakout Atari leg; its brick-hit blips encode the struck ROW as pitch.

The observation/step machinery is shared with the SkelPlus env
(skeleton_native.NativeSkeletonPlus); only the C-API prefix, the reward
(ALE-style raw score delta), and the action set (6 joystick actions, held
level-triggered for the whole frameskip window) differ.
"""

from __future__ import annotations

import os

import jax.numpy as jnp

from mmtrl_tpu.envs.skeleton_native import NativeSkeletonPlus

RALLY_ROM = os.path.join(
    os.path.dirname(__file__), "..", "..", "native", "homebrew", "rally.bin"
)
BRICK_ROM = os.path.join(
    os.path.dirname(__file__), "..", "..", "native", "homebrew", "brick.bin"
)


class NativeHomebrew(NativeSkeletonPlus):
    """Batched env over a homebrew RL-ABI cartridge.

    Actions (abi_env.cc): 0 NOOP, 1 LEFT, 2 RIGHT, 3 UP, 4 DOWN, 5 FIRE.
    Reward: raw score delta (the ALE convention); ``reward_mode="win"``
    adds a +5 terminal bonus on reaching the game's win screen.
    """

    PREFIX = "mmtrl_abi"

    def __init__(
        self,
        num_envs: int,
        rom_path: str = RALLY_ROM,
        seed: int = 0,
        frameskip: int = 8,
        episode_steps: int = 1500,
        reward_mode: str = "score",
        repeat_action_probability: float = 0.0,
    ):
        src_path = os.path.splitext(rom_path)[0] + ".asm"
        if not os.path.exists(rom_path) and os.path.exists(src_path):
            # Assemble the committed source on first use (tools/ sits next
            # to the package when running from a checkout).  Write via a
            # temp file + atomic rename: concurrent lanes starting from a
            # fresh checkout must never ctypes-load a half-written ROM.
            from tools.asm6502 import assemble_cartridge

            with open(src_path) as f:
                rom = assemble_cartridge(f.read())
            tmp_path = f"{rom_path}.tmp.{os.getpid()}"
            with open(tmp_path, "wb") as f:
                f.write(rom)
            os.replace(tmp_path, rom_path)
        super().__init__(
            num_envs=num_envs,
            rom_path=rom_path,
            seed=seed,
            frameskip=frameskip,
            episode_steps=episode_steps,
            reward_mode=reward_mode,
            repeat_action_probability=repeat_action_probability,
        )
        self._rom_path = rom_path

    def _reward(self, kd, ld, win):
        del ld
        r = kd.astype(jnp.float32)
        if self.reward_mode == "win":
            r = r + 5.0 * win.astype(jnp.float32)
        return r

    @property
    def name(self) -> str:
        stem = os.path.splitext(os.path.basename(self._rom_path))[0]
        return f"{stem}_native"


class NativeBrick(NativeHomebrew):
    """The BRICK (Breakout-class) cartridge with its ROM as the default."""

    def __init__(self, num_envs: int, rom_path: str = BRICK_ROM, **kw):
        super().__init__(num_envs=num_envs, rom_path=rom_path, **kw)


def make_native_env(
    env_id: str,
    num_envs: int,
    rom_path: str = "",
    seed: int = 0,
    frameskip: int = 8,
    episode_steps: int = 1500,
    reward_mode: str = "score",
    repeat_action_probability: float = 0.0,
):
    """One factory for every native-2600 RL env (the scripts/*_rom.py entry).

    Reward-mode vocabularies differ per game family — skeleton understands
    'shaped'/'kills', the homebrew RL-ABI games 'score'/'win' — so each
    script's single default ('score' for the value-based scripts, 'shaped'
    for dt_rom.py) is remapped to the target family's default here, in ONE
    place, instead of each script hand-rolling the translation.
    """
    if env_id in ("rally_native", "brick_native"):
        default_rom = BRICK_ROM if env_id == "brick_native" else RALLY_ROM
        return NativeHomebrew(
            num_envs=num_envs,
            rom_path=rom_path or default_rom,
            seed=seed,
            frameskip=frameskip,
            episode_steps=episode_steps,
            reward_mode="score" if reward_mode == "shaped" else reward_mode,
            repeat_action_probability=repeat_action_probability,
        )
    if env_id == "skeleton_plus_native":
        from mmtrl_tpu.envs.skeleton_native import NativeSkeletonPlus

        kw = dict(
            num_envs=num_envs,
            seed=seed,
            frameskip=frameskip,
            episode_steps=episode_steps,
            reward_mode="shaped" if reward_mode == "score" else reward_mode,
            repeat_action_probability=repeat_action_probability,
        )
        if rom_path:
            kw["rom_path"] = rom_path
        return NativeSkeletonPlus(**kw)
    raise ValueError(f"unknown native env id: {env_id}")
