"""Minecraft2d: the multimodal (video+audio) gridworld, fully device-resident.

Behavioral parity with the reference env (environments/Minecraft/
Minecraft.py), re-architected for TPU:

- 5x5 grid; agent, good target (gold pick), bad target (bronze shovel), gem
  of hidden type in {gold, iron} (Minecraft.py:41,74-75).
- Rewards +10 / -10 / -1-per-step (Minecraft.py:69-72); +10 for reaching the
  target matching the gem type, -10 for the other (Minecraft.py:193-200).
- Episode ends on either target or after MAX_ITER=30 steps
  (Minecraft.py:209-216); auto-reset.
- Observation (2, 84, 84) float32 in [-1, 1]: channel 0 a grayscale render
  of the grid, channel 1 an MFCC spectrogram image.  The gem is ALWAYS
  rendered as its gold variant (Minecraft.py:311-318) so only audio reveals
  its type; within LISTEN_RANGE=1.5 of the gem the audio channel is the
  gem-type wav's MFCC, else background noise (Minecraft.py:145-159).
- The declared observation space keeps the reference's (quirky) Box(0, 4)
  bounds (Minecraft.py:57).

TPU design: rendering is one einsum against a precomputed contribution bank
(see envs/assets.py) and audio is a 3-way select over cached MFCC planes —
zero host involvement, so thousands of envs vmap/shard over the mesh and the
whole rollout lives in one scanned XLA program.  Reset draws the 4 entity
cells without replacement (the reference rejection-samples to the same
all-distinct uniform distribution, Minecraft.py:77-115).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from mmtrl_tpu.envs import spaces
from mmtrl_tpu.envs.assets import (
    GRID,
    IMG,
    N_TILES,
    T_AGENT,
    T_BAD,
    T_GEM,
    T_GOOD,
    audio_planes,
    minecraft_render_bank,
)
from mmtrl_tpu.envs.base import Environment

# Actions (reference: Minecraft.py:13-21)
UP, DOWN, RIGHT, LEFT = 0, 1, 2, 3

GEM_GOLD, GEM_IRON = 0, 1
MAX_ITER = 30  # reference: Config.py:76 (+ STACKED_FRAMES-1 == +0)
LISTEN_RANGE_SQ = 2  # integer cells: d^2 <= 2  <=>  d <= 1.5 (Config.py:77)

REWARD_STEP = -1.0
REWARD_GOOD = 10.0
REWARD_BAD = -10.0


@struct.dataclass
class MinecraftState:
    agent: jnp.ndarray  # (2,) int32 row, col
    good: jnp.ndarray  # (2,)
    bad: jnp.ndarray  # (2,)
    gem: jnp.ndarray  # (2,)
    gem_type: jnp.ndarray  # () int32, 0 gold / 1 iron
    t: jnp.ndarray  # () int32


class Minecraft2d(Environment):
    def __init__(self, use_audio: bool = True):
        self.use_audio = use_audio
        self._bank = jnp.asarray(minecraft_render_bank())  # (25, 5, 84, 84)
        self._audio = jnp.asarray(audio_planes())  # (3, 84, 84)

    # ---- reset ----------------------------------------------------------
    def _reset(self, key):
        k_cells, k_gem = jax.random.split(key)
        cells = jax.random.choice(
            k_cells, GRID * GRID, shape=(4,), replace=False
        ).astype(jnp.int32)
        locs = jnp.stack([cells // GRID, cells % GRID], axis=-1)
        state = MinecraftState(
            agent=locs[0],
            good=locs[1],
            bad=locs[2],
            gem=locs[3],
            gem_type=jax.random.randint(k_gem, (), 0, 2, dtype=jnp.int32),
            t=jnp.zeros((), jnp.int32),
        )
        return self._obs(state), state

    # ---- rendering ------------------------------------------------------
    def _tile_map(self, s: MinecraftState) -> jnp.ndarray:
        """(25,) int32 tile id per cell; priority agent > good > bad > gem."""
        cell = lambda loc: loc[0] * GRID + loc[1]  # noqa: E731
        tiles = jnp.zeros(GRID * GRID, dtype=jnp.int32)
        tiles = tiles.at[cell(s.gem)].set(T_GEM)  # drawn gold regardless of type
        tiles = tiles.at[cell(s.bad)].set(T_BAD)
        tiles = tiles.at[cell(s.good)].set(T_GOOD)
        tiles = tiles.at[cell(s.agent)].set(T_AGENT)
        return tiles

    def _obs(self, s: MinecraftState) -> jnp.ndarray:
        onehot = jax.nn.one_hot(self._tile_map(s), N_TILES, dtype=jnp.float32)
        # Clip to [0, 255] like the reference's uint8 saturation before the
        # affine rescale (bicubic can overshoot at tile edges).
        frame = jnp.clip(jnp.einsum("pt,ptyx->yx", onehot, self._bank), 0.0, 255.0)
        frame = frame * (2.0 / 255.0) - 1.0
        if not self.use_audio:
            return frame[None]
        d2 = jnp.sum((s.agent - s.gem) ** 2)
        audio_idx = jnp.where(d2 <= LISTEN_RANGE_SQ, s.gem_type, 2)
        audio = self._audio[audio_idx]
        return jnp.stack([frame, audio])

    # ---- step -----------------------------------------------------------
    def _step_env(
        self, key, state: MinecraftState, action
    ) -> Tuple[jnp.ndarray, MinecraftState, jnp.ndarray, jnp.ndarray, Dict]:
        # Moves with boundary clamping (Minecraft.py:161-186).
        deltas = jnp.array([[-1, 0], [1, 0], [0, 1], [0, -1]], dtype=jnp.int32)
        agent = jnp.clip(state.agent + deltas[action], 0, GRID - 1)

        at_good = jnp.all(agent == state.good)
        at_bad = jnp.all(agent == state.bad)
        gold = state.gem_type == GEM_GOLD
        reward = jnp.where(
            (at_good & gold) | (at_bad & ~gold),
            REWARD_GOOD,
            jnp.where((at_good & ~gold) | (at_bad & gold), REWARD_BAD, REWARD_STEP),
        ).astype(jnp.float32)

        new = state.replace(agent=agent, t=state.t + 1)
        done = at_good | at_bad | (new.t >= MAX_ITER)
        info = {"at_good": at_good, "at_bad": at_bad}
        return self._obs(new), new, reward, done, info

    # ---- spaces ---------------------------------------------------------
    @property
    def observation_space(self):
        shape = (2 if self.use_audio else 1, IMG, IMG)
        return spaces.Box(0.0, 4.0, shape)  # reference's declared bounds

    @property
    def action_space(self):
        return spaces.Discrete(4)

    @property
    def name(self):
        return "minecraft"
