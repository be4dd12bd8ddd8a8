"""ProcMaze: procgen-contract procedural level distribution
(envs/procmaze.py; reference contract: cleanrl/ppg_procgen.py:73-76
num_levels/start_level train-window selection)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmtrl_tpu.envs.procmaze import (
    GRID, IMG, ProcMaze, REWARD_GOAL, REWARD_STEP,
)


@pytest.fixture(scope="module")
def env():
    return ProcMaze(num_levels=20, total_levels=40)


def test_obs_contract(env):
    obs, state = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (3, IMG, IMG)
    assert float(obs.min()) == -1.0 and float(obs.max()) == 1.0
    assert env.num_actions == 4


def test_levels_are_solvable_and_distinct(env):
    """Every generated level has a BFS path start->goal (perfect maze), and
    the distribution isn't degenerate (levels differ)."""
    walls = np.asarray(env._walls)
    starts = np.asarray(env._starts)
    goals = np.asarray(env._goals)
    from collections import deque

    for li in range(walls.shape[0]):
        seen = {tuple(starts[li])}
        q = deque([tuple(starts[li])])
        found = False
        while q:
            r, c = q.popleft()
            if (r, c) == tuple(goals[li]):
                found = True
                break
            for dr, dc in ((-1, 0), (1, 0), (0, -1), (0, 1)):
                nr, nc = r + dr, c + dc
                if (
                    0 <= nr < GRID and 0 <= nc < GRID
                    and not walls[li, nr, nc] and (nr, nc) not in seen
                ):
                    seen.add((nr, nc))
                    q.append((nr, nc))
        assert found, f"level {li} unsolvable"
    assert len({walls[i].tobytes() for i in range(walls.shape[0])}) > 30


def test_train_window_respected():
    env = ProcMaze(num_levels=5, start_level=10, total_levels=40)
    levels = []
    step = jax.jit(env.step)
    for i in range(40):
        _, state = env.reset(jax.random.PRNGKey(i))
        levels.append(int(state.level))
    assert min(levels) >= 10 and max(levels) < 15
    # Disjoint test window never overlaps.
    test_env = ProcMaze(num_levels=5, start_level=20, total_levels=40)
    _, tstate = test_env.reset(jax.random.PRNGKey(0))
    assert int(tstate.level) >= 20


def test_bfs_policy_reaches_goal_under_jit(env):
    """Walk the BFS shortest path through the jitted env: the goal must pay
    REWARD_GOAL and terminate; steps pay REWARD_STEP; walls block."""
    obs, state = env.reset(jax.random.PRNGKey(3))
    walls = np.asarray(env._walls[int(state.level)])
    goal = tuple(np.asarray(env._goals[int(state.level)]))
    from collections import deque

    # BFS parent map from the agent's position.
    start = tuple(np.asarray(state.pos))
    parent = {start: None}
    q = deque([start])
    while q:
        cur = q.popleft()
        if cur == goal:
            break
        for a, (dr, dc) in enumerate([(-1, 0), (1, 0), (0, -1), (0, 1)]):
            nxt = (cur[0] + dr, cur[1] + dc)
            if (
                0 <= nxt[0] < GRID and 0 <= nxt[1] < GRID
                and not walls[nxt] and nxt not in parent
            ):
                parent[nxt] = (cur, a)
                q.append(nxt)
    path = []
    node = goal
    while parent[node] is not None:
        prev, a = parent[node]
        path.append(a)
        node = prev
    path.reverse()

    step = jax.jit(env.step)
    key = jax.random.PRNGKey(0)
    total = 0.0
    for i, a in enumerate(path):
        key, k = jax.random.split(key)
        obs, state, reward, done, info = step(k, state, jnp.asarray(a))
        total += float(reward)
        if i < len(path) - 1:
            assert not bool(done)
    assert bool(done)
    assert bool(info["solved"])
    expected = REWARD_GOAL + REWARD_STEP * len(path)
    assert abs(total - expected) < 1e-5


def test_wall_blocks(env):
    obs, state = env.reset(jax.random.PRNGKey(3))
    walls = np.asarray(env._walls[int(state.level)])
    pos = tuple(np.asarray(state.pos))
    # Find a blocked direction from the start.
    step = jax.jit(env.step)
    for a, (dr, dc) in enumerate([(-1, 0), (1, 0), (0, -1), (0, 1)]):
        nxt = (pos[0] + dr, pos[1] + dc)
        if not (0 <= nxt[0] < GRID and 0 <= nxt[1] < GRID) or walls[nxt]:
            _, s2, _, _, _ = step(jax.random.PRNGKey(0), state, jnp.asarray(a))
            assert tuple(np.asarray(s2.pos)) == pos
            return
    pytest.skip("start cell has no adjacent wall (unlikely)")


def test_timeout_truncates():
    env = ProcMaze(num_levels=2, total_levels=4, max_steps=5)
    obs, state = env.reset(jax.random.PRNGKey(1))
    step = jax.jit(env._step_env)
    done = False
    for i in range(5):  # NOOP-ish: bounce into a wall if possible
        obs, state, reward, done, info = step(
            jax.random.PRNGKey(i), state, jnp.asarray(0)
        )
        if bool(info["solved"]):
            pytest.skip("random walk hit the goal")
    assert bool(done)


def test_obs_exactly_int8_representable():
    """The PPG aux-phase stores procmaze obs as int8 (scripts/ppg.py
    aux_store_dtype='auto'); that is only sound because every obs value is
    exactly a small integer.  Guard the invariant the storage dtype
    depends on (envs/procmaze.py builds ±1 pixel planes)."""
    import numpy as np

    env = ProcMaze(num_levels=8)
    keys = jax.random.split(jax.random.PRNGKey(3), 4)
    obs, state = env.v_reset(keys)
    for i in range(6):
        o = np.asarray(obs)
        assert np.array_equal(o, o.astype(np.int8).astype(np.float32))
        obs, state, *_ = env.v_step(
            jax.random.split(jax.random.PRNGKey(i), 4), state,
            jnp.full((4,), i % 4),
        )
