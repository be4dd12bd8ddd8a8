"""Skeleton+ simulator: maze hunt with streaming stereo audio, on device.

A behavioral model of the reference's Skeleton+ 2600 ROM
(environments/skeleton_plus/SkelPlus.bin; gameplay contract per
SkelPlus.txt §2): the agent navigates a maze hunting a pursuing skeleton;
the skeleton is VISIBLE only in the line of sight ahead; its footsteps are
AUDIBLE always — volume encodes distance and front/back, stereo balance
encodes left/right (SkelPlus.txt:44-50).  Five kills advance the episode to
a win; contact drains life; each new skeleton takes one more hit and speeds
up over time.

TPU-native pipeline per step, all inside jit:
1. dynamics via precomputed BFS tables (skeleton pursuit, line of sight),
2. stereo synthesis: the base footstep window scaled by (distance,
   front/back, L/R) gains at the ROM's 30720 Hz rate,
3. streaming MFCC of each channel (ops/mfcc.py jnp path, the WINLEN=0.010 /
   WINSTEP=0.003 parameters of Config.py:87-89),
4. observation (3, 84, 84): top-down video frame, MFCC-left, MFCC-right
   planes (fixed-statistics normalization to [-1, 1]).

The eventual C++ 6502/TIA core slots in behind the same observation
contract via envs/native_bridge.py.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from mmtrl_tpu.envs import spaces
from mmtrl_tpu.envs.base import Environment
from mmtrl_tpu.envs.skeleton_assets import (
    FACING_DELTAS,
    IMG,
    SIZE,
    WINDOW,
    cell_tables,
    footstep_window,
    maze,
    mfcc_resize_ops,
    open_cells,
    render_layers,
    silence_mfcc_stats,
)
from mmtrl_tpu.ops.mfcc import SKELETON_PLUS_PARAMS, mfcc

# Actions (ROM: joystick + fire)
FORWARD, TURN_LEFT, TURN_RIGHT, FIRE, NOOP = range(5)

MAX_STEPS = 400
KILLS_TO_WIN = 5
START_LIFE = 3
REWARD_KILL = 10.0
REWARD_WIN = 50.0
REWARD_HIT_TAKEN = -5.0
REWARD_STEP = -0.01
FIRE_RANGE = 6


@struct.dataclass
class SkeletonState:
    agent: jnp.ndarray  # () int32 flat cell
    facing: jnp.ndarray  # () int32 0..3
    skeleton: jnp.ndarray  # () int32 flat cell
    skel_hits: jnp.ndarray  # () int32 hits landed on current skeleton
    kills: jnp.ndarray  # () int32
    life: jnp.ndarray  # () int32
    t: jnp.ndarray  # () int32
    phase: jnp.ndarray  # () int32 footstep phase (move cadence)


class SkeletonPlusSim(Environment):
    def __init__(self):
        next_step, dist, vis = cell_tables()
        self._next = jnp.asarray(next_step)
        self._dist = jnp.asarray(dist)
        self._vis = jnp.asarray(vis)
        wall, agent_bank, skel_bank = render_layers()
        self._wall = jnp.asarray(wall)
        self._agent_bank = jnp.asarray(agent_bank)
        self._skel_bank = jnp.asarray(skel_bank)
        self._open = jnp.asarray(open_cells()[:, 0] * SIZE + open_cells()[:, 1])
        self._footstep = jnp.asarray(footstep_window())
        w_rows, w_cols, _ = mfcc_resize_ops()
        self._w_rows = jnp.asarray(w_rows)
        self._w_cols = jnp.asarray(w_cols)
        lo, hi = silence_mfcc_stats()
        self._mfcc_lo, self._mfcc_hi = lo, hi

    # ------------------------------------------------------------------
    def _reset(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        cells = jax.random.choice(k1, self._open, shape=(2,), replace=False)
        state = SkeletonState(
            agent=cells[0].astype(jnp.int32),
            facing=jax.random.randint(k2, (), 0, 4, dtype=jnp.int32),
            skeleton=cells[1].astype(jnp.int32),
            skel_hits=jnp.zeros((), jnp.int32),
            kills=jnp.zeros((), jnp.int32),
            life=jnp.asarray(START_LIFE, jnp.int32),
            t=jnp.zeros((), jnp.int32),
            phase=jnp.zeros((), jnp.int32),
        )
        return self._obs(state, k3), state

    # ------------------------------------------------------------------
    def _audio_gains(self, s: SkeletonState) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(left, right) footstep amplitude per SkelPlus.txt:44-50."""
        d = self._dist[s.agent, s.skeleton]
        base = 1.0 / (1.0 + 0.7 * d)
        # front/back: vector to skeleton dotted with facing
        ar, ac = s.agent // SIZE, s.agent % SIZE
        sr, sc = s.skeleton // SIZE, s.skeleton % SIZE
        dvec = jnp.stack([(sr - ar).astype(jnp.float32), (sc - ac).astype(jnp.float32)])
        norm = jnp.maximum(jnp.linalg.norm(dvec), 1e-6)
        fvec = jnp.asarray(FACING_DELTAS, jnp.float32)[s.facing]
        frontness = (dvec @ fvec) / norm  # +1 ahead, -1 behind
        base = base * (1.0 + 0.5 * frontness)
        # left/right: projection onto the right-hand vector.  In (row, col)
        # screen coordinates (rows grow downward) the right of facing
        # (fr, fc) is (fc, -fr): facing North (-1,0) -> right = East (0,1).
        rightness = (dvec[0] * fvec[1] - dvec[1] * fvec[0]) / norm
        left = base * jnp.clip(1.0 - rightness, 0.2, 2.0)
        right = base * jnp.clip(1.0 + rightness, 0.2, 2.0)
        return left, right

    def _audio_plane(self, gain: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        """Synthesize one channel's window, run streaming MFCC, lift to
        (84, 84) with the precomputed linear operators."""
        noise = jax.random.normal(key, (WINDOW,)) * 0.01
        sig = (self._footstep * gain + noise) * 32000.0
        feat = mfcc(sig, SKELETON_PLUS_PARAMS, xp=jnp)  # (n_frames, numcep)
        feat = feat.T  # time along x like the reference's swapaxes
        img = self._w_rows @ feat @ self._w_cols.T
        img = (img - self._mfcc_lo) / (self._mfcc_hi - self._mfcc_lo)
        return jnp.clip(img * 2.0 - 1.0, -1.0, 1.0)

    def _obs(self, s: SkeletonState, key: jax.Array) -> jnp.ndarray:
        visible = self._vis[s.agent, s.facing, s.skeleton]
        frame = (
            self._wall
            + self._agent_bank[s.agent]
            + self._skel_bank[s.skeleton] * visible
        )
        frame = jnp.clip(frame, 0.0, 255.0) * (2.0 / 255.0) - 1.0
        kl, kr = jax.random.split(key)
        left, right = self._audio_gains(s)
        return jnp.stack(
            [frame, self._audio_plane(left, kl), self._audio_plane(right, kr)]
        )

    # ------------------------------------------------------------------
    def _step_env(self, key, state: SkeletonState, action):
        k_move, k_fire, k_respawn, k_obs = jax.random.split(key, 4)

        # Agent action.
        delta = jnp.asarray(FACING_DELTAS)[state.facing]
        r, c = state.agent // SIZE, state.agent % SIZE
        nr, nc = r + delta[0], c + delta[1]
        wall_map = jnp.asarray(maze().reshape(-1).astype(bool))
        fwd_cell = nr * SIZE + nc
        can_move = ~wall_map[fwd_cell]
        agent = jnp.where((action == FORWARD) & can_move, fwd_cell, state.agent)
        facing = jnp.where(
            action == TURN_LEFT,
            (state.facing + 3) % 4,
            jnp.where(action == TURN_RIGHT, (state.facing + 1) % 4, state.facing),
        ).astype(jnp.int32)

        # Fire: hits if skeleton in line of sight within range; accuracy is
        # imperfect ("not a dead shot", SkelPlus.txt §2).
        in_sight = self._vis[agent, facing, state.skeleton]
        in_range = self._dist[agent, state.skeleton] <= FIRE_RANGE
        hit_roll = jax.random.uniform(k_fire) < 0.8
        hit = (action == FIRE) & in_sight & in_range & hit_roll
        hits_needed = 1 + state.kills  # each skeleton is tougher
        skel_hits = state.skel_hits + hit.astype(jnp.int32)
        killed = skel_hits >= hits_needed
        kills = state.kills + killed.astype(jnp.int32)

        # Skeleton pursuit: speeds up with its age (phase cadence).
        speed_period = jnp.maximum(3 - state.t // 100, 1)
        moves = (state.t % speed_period) == 0
        pursued = self._next[state.skeleton, agent]
        skeleton = jnp.where(moves, pursued, state.skeleton)
        # respawn on kill at a random open cell away from the agent
        respawn = self._open[
            jax.random.randint(k_respawn, (), 0, self._open.shape[0])
        ]
        skeleton = jnp.where(killed, respawn, skeleton).astype(jnp.int32)
        skel_hits = jnp.where(killed, 0, skel_hits)

        # Contact drains life.
        touched = (skeleton == agent) & ~killed
        life = state.life - touched.astype(jnp.int32)

        won = kills >= KILLS_TO_WIN
        dead = life <= 0
        new = SkeletonState(
            agent=agent.astype(jnp.int32),
            facing=facing,
            skeleton=skeleton,
            skel_hits=skel_hits,
            kills=kills,
            life=life,
            t=state.t + 1,
            phase=(state.phase + 1) % 4,
        )
        done = won | dead | (new.t >= MAX_STEPS)
        reward = (
            REWARD_STEP
            + REWARD_KILL * killed.astype(jnp.float32)
            + REWARD_WIN * won.astype(jnp.float32)
            + REWARD_HIT_TAKEN * touched.astype(jnp.float32)
        ).astype(jnp.float32)
        info: Dict[str, jnp.ndarray] = {"kills": kills, "life": life}
        return self._obs(new, k_obs), new, reward, done, info

    @property
    def observation_space(self):
        return spaces.Box(-1.0, 1.0, (3, IMG, IMG))

    @property
    def action_space(self):
        return spaces.Discrete(5)

    @property
    def name(self):
        return "skeleton_plus"
