"""Doorpuzzle: two-stage key/door puzzle with noisy actions, device-resident.

Behavioral parity with the reference env (environments/Doorpuzzle/
Doorpuzzle.py), re-architected for TPU like Minecraft2d:

- 5x5 grid; agent starts at (0,0), door1 at (0,4), door2 at (4,0)
  (Doorpuzzle.py:73-79); key at center (2,2), or uniform non-overlapping in
  hard mode (Doorpuzzle.py:82-92); hidden key type in {1, 2}.
- Action noise: with probability NOISE_TRANS=0.2 the move slips laterally,
  10% each side (Doorpuzzle.py:147-163, Config.py:62).
- Stage 1: walking onto the key cell silently picks it up (reward 0,
  Doorpuzzle.py:211-213).  Stage 2: reward 1.0 only at the door matching the
  key type while holding the key (Doorpuzzle.py:214-229); all other steps 0.
- Episode ends at either door (with or without key) or after 30 steps
  (Doorpuzzle.py:240-253); auto-reset.
- Audio: within LISTEN_RANGE=1.5 of the key and not yet holding it, the
  audio channel is key-type wav's MFCC; else noise (Doorpuzzle.py:130-145).
- Simple-render visuals: flat gray values per tile on a 125-gray canvas
  (Doorpuzzle.py:289-296,384-390), nearest-neighbor resize to 84x84.  The
  key is rendered after pickup as background.  The reference's known
  key2-drawn-as-key1 overlay bug (Doorpuzzle.py:309) only affects its
  non-simple render path, which its own `_check_params` forbids, so it is
  not reproduced.

The reference's `step` returns a 3-tuple without info (Doorpuzzle.py:255);
here the API is uniform (info dict always present).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from mmtrl_tpu.envs import spaces
from mmtrl_tpu.envs.assets import (
    DP_AGENT,
    DP_KEY1,
    DP_KEY2,
    DP_N_TILES,
    DP_T1,
    DP_T2,
    GRID,
    IMG,
    audio_planes,
    doorpuzzle_base_frame,
    doorpuzzle_render_bank,
)
from mmtrl_tpu.envs.base import Environment

UP, DOWN, RIGHT, LEFT = 0, 1, 2, 3
MAX_ITER = 30
LISTEN_RANGE_SQ = 2
NOISE_TRANS = 0.2

# Lateral-slip table (Doorpuzzle.py:150-157): row = intended action,
# columns = [left-slip, straight, right-slip].
_SLIP = jnp.array(
    [
        [LEFT, UP, RIGHT],
        [RIGHT, DOWN, LEFT],
        [UP, RIGHT, DOWN],
        [DOWN, LEFT, UP],
    ],
    dtype=jnp.int32,
)


@struct.dataclass
class DoorpuzzleState:
    agent: jnp.ndarray  # (2,) int32
    key_loc: jnp.ndarray  # (2,) int32
    key_type: jnp.ndarray  # () int32: 1 or 2
    has_key: jnp.ndarray  # () bool
    t: jnp.ndarray  # () int32


class Doorpuzzle(Environment):
    def __init__(self, hard_mode: bool = False, use_audio: bool = True):
        self.hard_mode = hard_mode
        self.use_audio = use_audio
        self._bank = jnp.asarray(doorpuzzle_render_bank())
        self._base = jnp.asarray(doorpuzzle_base_frame())
        self._audio = jnp.asarray(audio_planes())
        self._door1 = jnp.array([0, GRID - 1], dtype=jnp.int32)
        self._door2 = jnp.array([GRID - 1, 0], dtype=jnp.int32)

    def _reset(self, key):
        k_type, k_loc = jax.random.split(key)
        key_type = jax.random.randint(k_type, (), 1, 3, dtype=jnp.int32)
        if self.hard_mode:
            # Uniform over cells excluding agent(0,0), door1(0,4), door2(4,0)
            # (reference rejection-samples the same distribution,
            # Doorpuzzle.py:82-88).
            forbidden = jnp.array([0, GRID - 1, GRID * (GRID - 1)])
            logits = jnp.zeros(GRID * GRID).at[forbidden].set(-jnp.inf)
            cell = jax.random.categorical(k_loc, logits)
            key_loc = jnp.stack([cell // GRID, cell % GRID]).astype(jnp.int32)
        else:
            key_loc = jnp.array([GRID // 2, GRID // 2], dtype=jnp.int32)
        state = DoorpuzzleState(
            agent=jnp.zeros(2, dtype=jnp.int32),
            key_loc=key_loc,
            key_type=key_type,
            has_key=jnp.zeros((), dtype=bool),
            t=jnp.zeros((), jnp.int32),
        )
        return self._obs(state), state

    def _obs(self, s: DoorpuzzleState) -> jnp.ndarray:
        cell = lambda loc: loc[0] * GRID + loc[1]  # noqa: E731
        tiles = jnp.zeros(GRID * GRID, dtype=jnp.int32)  # DP_BG == 0
        key_tile = jnp.where(
            s.has_key, 0, jnp.where(s.key_type == 1, DP_KEY1, DP_KEY2)
        )
        tiles = tiles.at[cell(s.key_loc)].set(key_tile)
        tiles = tiles.at[cell(self._door1)].set(DP_T1)
        tiles = tiles.at[cell(self._door2)].set(DP_T2)
        tiles = tiles.at[cell(s.agent)].set(DP_AGENT)
        onehot = jax.nn.one_hot(tiles, DP_N_TILES, dtype=jnp.float32)
        frame = self._base + jnp.einsum("pt,ptyx->yx", onehot, self._bank)
        frame = jnp.clip(frame, 0.0, 255.0) * (2.0 / 255.0) - 1.0
        if not self.use_audio:
            return frame[None]
        d2 = jnp.sum((s.agent - s.key_loc) ** 2)
        audible = (~s.has_key) & (d2 <= LISTEN_RANGE_SQ)
        audio_idx = jnp.where(audible, s.key_type - 1, 2)
        return jnp.stack([frame, self._audio[audio_idx]])

    def _step_env(self, key, state: DoorpuzzleState, action):
        slip = jax.random.choice(
            key,
            3,
            p=jnp.array([NOISE_TRANS / 2, 1.0 - NOISE_TRANS, NOISE_TRANS / 2]),
        )
        actual = _SLIP[action, slip]
        deltas = jnp.array([[-1, 0], [1, 0], [0, 1], [0, -1]], dtype=jnp.int32)
        agent = jnp.clip(state.agent + deltas[actual], 0, GRID - 1)

        on_key = jnp.all(agent == state.key_loc) & ~state.has_key
        has_key = state.has_key | on_key
        at_d1 = jnp.all(agent == self._door1)
        at_d2 = jnp.all(agent == self._door2)
        # Reward uses the PRE-pickup has_key on door cells — irrelevant in
        # practice since key/doors never coincide; matches Doorpuzzle.py:211-231.
        reward = jnp.where(
            (at_d1 & state.has_key & (state.key_type == 1))
            | (at_d2 & state.has_key & (state.key_type == 2)),
            1.0,
            0.0,
        ).astype(jnp.float32)

        new = state.replace(agent=agent, has_key=has_key, t=state.t + 1)
        done = at_d1 | at_d2 | (new.t >= MAX_ITER)
        info = {"has_key": has_key, "success": reward > 0}
        return self._obs(new), new, reward, done, info

    @property
    def observation_space(self):
        shape = (2 if self.use_audio else 1, IMG, IMG)
        return spaces.Box(-1.0, 1.0, shape)

    @property
    def action_space(self):
        return spaces.Discrete(4)

    @property
    def name(self):
        return "doorpuzzle"
