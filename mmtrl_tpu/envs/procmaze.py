"""ProcMaze: a procgen-style procedurally-generated maze benchmark, on device.

The reference's ppo_procgen.py / ppg_procgen.py train on Procgen — image
envs whose LEVELS are drawn from a seeded procedural distribution
(cleanrl/ppg_procgen.py:73-76: ``num_levels``/``start_level`` control the
train split; generalization is measured on unseen levels).  The procgen C++
engine isn't installable here (zero egress), so this env reproduces the
benchmark'S CONTRACT the TPU-native way:

- levels are generated host-side once at construction (randomized-DFS
  perfect mazes, numpy) and stacked into device arrays — level selection,
  stepping, and rendering all happen inside jit;
- ``start_level``/``num_levels`` select the training level window exactly
  like procgen: an env built with a disjoint window measures train→test
  generalization (tests/test_procmaze.py);
- observations are (3, 84, 84) float images in [-1, 1] (walls / agent /
  goal planes upsampled to pixel blocks), sized for the IMPALA tower
  (models/common.py::ImpalaTower) that ppg.py uses.

Rewards: +10 on reaching the goal (episode ends), -0.01 per step, timeout
at ``max_steps``.  All episodes are solvable by construction (perfect maze
⇒ unique path between any two cells).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from mmtrl_tpu.envs import spaces
from mmtrl_tpu.envs.base import Environment

GRID = 13          # maze cells per side (odd: walls on even lattice lines)
IMG = 84
CELL_PX = IMG // GRID  # 6 px per cell, 6*13=78, centered with 3 px margin
MARGIN = (IMG - GRID * CELL_PX) // 2

REWARD_GOAL = 10.0
REWARD_STEP = -0.01

# Actions: 0 up, 1 down, 2 left, 3 right (row/col deltas).
DELTAS = np.array([[-1, 0], [1, 0], [0, -1], [0, 1]], np.int32)


def _gen_maze(rng: np.random.Generator) -> np.ndarray:
    """Randomized-DFS perfect maze on a GRID×GRID grid; True = wall."""
    walls = np.ones((GRID, GRID), bool)
    # Cells live on odd coordinates; walls between them are carved.
    cells = [(r, c) for r in range(1, GRID, 2) for c in range(1, GRID, 2)]
    start = cells[rng.integers(len(cells))]
    stack = [start]
    walls[start] = False
    while stack:
        r, c = stack[-1]
        nbrs = []
        for dr, dc in ((-2, 0), (2, 0), (0, -2), (0, 2)):
            nr, nc = r + dr, c + dc
            if 1 <= nr < GRID - 1 and 1 <= nc < GRID - 1 and walls[nr, nc]:
                nbrs.append((nr, nc))
        if not nbrs:
            stack.pop()
            continue
        nr, nc = nbrs[rng.integers(len(nbrs))]
        walls[(r + nr) // 2, (c + nc) // 2] = False
        walls[nr, nc] = False
        stack.append((nr, nc))
    return walls


def _far_apart(rng: np.random.Generator, walls: np.ndarray):
    """Start and goal on distinct open cells, biased far apart."""
    open_cells = np.argwhere(~walls)
    best, best_d = None, -1
    for _ in range(8):
        a, b = open_cells[rng.integers(len(open_cells), size=2)]
        while np.array_equal(a, b):  # distinct cells (redraw keeps the RNG
            a, b = open_cells[rng.integers(len(open_cells), size=2)]  # stream
        d = abs(int(a[0]) - int(b[0])) + abs(int(a[1]) - int(b[1]))
        if d > best_d:
            best, best_d = (a, b), d
    return best


@struct.dataclass
class ProcMazeState:
    level: jnp.ndarray  # () int32 index into the level bank
    pos: jnp.ndarray    # (2,) int32 row, col
    t: jnp.ndarray      # () int32


class ProcMaze(Environment):
    """Procgen-contract maze distribution.

    ``num_levels=0`` means the full distribution (procgen convention);
    here "full" is ``total_levels`` generated levels.

    Convention: hitting ``max_steps`` is folded into ``done`` with no
    truncation distinction (GAE does not bootstrap through time-limit
    ends) — consistent with this repo's other device-resident envs.
    """

    def __init__(
        self,
        num_levels: int = 200,
        start_level: int = 0,
        total_levels: int = 1000,
        max_steps: int = 256,
        seed: int = 1234,  # generation seed: fixed so splits are stable
    ):
        if num_levels == 0:
            num_levels = total_levels - start_level
        assert start_level + num_levels <= total_levels
        rng = np.random.default_rng(seed)
        walls, starts, goals = [], [], []
        for _ in range(total_levels):
            w = _gen_maze(rng)
            (s, g) = _far_apart(rng, w)
            walls.append(w)
            starts.append(s)
            goals.append(g)
        walls = np.stack(walls)  # (L, GRID, GRID)
        self.start_level = start_level
        self.num_levels = num_levels
        self.max_steps = max_steps
        self._walls = jnp.asarray(walls)
        self._starts = jnp.asarray(np.stack(starts).astype(np.int32))
        self._goals = jnp.asarray(np.stack(goals).astype(np.int32))
        # Pre-rendered wall planes in [-1, 1]: walls white(+1) on black(-1).
        px = np.full((total_levels, IMG, IMG), -1.0, np.float32)
        for li in range(total_levels):
            for r in range(GRID):
                for c in range(GRID):
                    if walls[li, r, c]:
                        r0 = MARGIN + r * CELL_PX
                        c0 = MARGIN + c * CELL_PX
                        px[li, r0:r0 + CELL_PX, c0:c0 + CELL_PX] = 1.0
        self._wall_px = jnp.asarray(px)
        # cell -> pixel-block plane, as a one-hot matmul bank:
        # (GRID*GRID, IMG*IMG) would be 1.2MB f32 — fine, but a scatter-free
        # gather of a precomputed per-cell plane is simpler still.
        blocks = np.full((GRID * GRID, IMG, IMG), -1.0, np.float32)
        for r in range(GRID):
            for c in range(GRID):
                r0 = MARGIN + r * CELL_PX
                c0 = MARGIN + c * CELL_PX
                blocks[r * GRID + c, r0:r0 + CELL_PX, c0:c0 + CELL_PX] = 1.0
        self._cell_px = jnp.asarray(blocks)

    # ---- Environment API -------------------------------------------------
    def _reset(self, key: jax.Array) -> Tuple[jnp.ndarray, ProcMazeState]:
        level = self.start_level + jax.random.randint(
            key, (), 0, self.num_levels
        )
        state = ProcMazeState(
            level=level.astype(jnp.int32),
            pos=self._starts[level],
            t=jnp.asarray(0, jnp.int32),
        )
        return self._obs(state), state

    def _obs(self, s: ProcMazeState) -> jnp.ndarray:
        agent = self._cell_px[s.pos[0] * GRID + s.pos[1]]
        goal_rc = self._goals[s.level]
        goal = self._cell_px[goal_rc[0] * GRID + goal_rc[1]]
        return jnp.stack([self._wall_px[s.level], agent, goal])

    def _step_env(
        self, key: jax.Array, state: ProcMazeState, action: jnp.ndarray
    ) -> Tuple[jnp.ndarray, ProcMazeState, jnp.ndarray, jnp.ndarray, Dict]:
        delta = jnp.asarray(DELTAS)[action]
        nxt = jnp.clip(state.pos + delta, 0, GRID - 1)
        blocked = self._walls[state.level, nxt[0], nxt[1]]
        pos = jnp.where(blocked, state.pos, nxt)
        goal = self._goals[state.level]
        reached = jnp.all(pos == goal)
        t = state.t + 1
        done = reached | (t >= self.max_steps)
        reward = REWARD_STEP + REWARD_GOAL * reached.astype(jnp.float32)
        new = ProcMazeState(level=state.level, pos=pos, t=t)
        info: Dict[str, jnp.ndarray] = {"level": state.level, "solved": reached}
        return self._obs(new), new, reward, done, info

    @property
    def observation_space(self) -> spaces.Box:
        return spaces.Box(-1.0, 1.0, (3, IMG, IMG))

    @property
    def action_space(self):
        return spaces.Discrete(4)

    @property
    def name(self) -> str:
        return f"procmaze[{self.start_level}:{self.start_level + self.num_levels}]"
