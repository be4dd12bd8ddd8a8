"""Skeleton+ simulator tests: the SkelPlus.txt gameplay/audio contract
(footstep volume encodes distance and front/back, stereo encodes left/right,
skeleton visible only in line of sight, pursuit, kills/life)."""

import jax
import jax.numpy as jnp
import numpy as np

from mmtrl_tpu.envs import make
from mmtrl_tpu.envs.skeleton_plus import (
    FIRE,
    FORWARD,
    SIZE,
    SkeletonPlusSim,
    SkeletonState,
    TURN_LEFT,
    TURN_RIGHT,
)


def mk_state(agent=(1, 1), facing=1, skeleton=(1, 3), kills=0, life=3, t=0):
    return SkeletonState(
        agent=jnp.int32(agent[0] * SIZE + agent[1]),
        facing=jnp.int32(facing),
        skeleton=jnp.int32(skeleton[0] * SIZE + skeleton[1]),
        skel_hits=jnp.int32(0),
        kills=jnp.int32(kills),
        life=jnp.int32(life),
        t=jnp.int32(t),
        phase=jnp.int32(0),
    )


env = SkeletonPlusSim()


def test_obs_shape_and_range():
    obs, _ = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (3, 84, 84)
    assert float(obs.min()) >= -1.0 - 1e-5 and float(obs.max()) <= 1.0 + 1e-5


def test_audio_volume_encodes_distance():
    key = jax.random.PRNGKey(5)
    near = env._obs(mk_state(skeleton=(1, 2)), key)
    far = env._obs(mk_state(skeleton=(9, 9)), key)
    # the log-energy band (top cepstral rows) is brighter when near
    assert float(near[1][:7].mean()) > float(far[1][:7].mean())


def test_stereo_encodes_side():
    key = jax.random.PRNGKey(6)
    # facing East (1); skeleton to the south = to the agent's right
    right_side = env._obs(mk_state(facing=1, skeleton=(3, 1)), key)
    assert float(right_side[2][:7].mean()) > float(right_side[1][:7].mean())
    # skeleton to the north = left
    left_side = env._obs(mk_state(facing=1, skeleton=(0, 1) if False else (1, 1)), key)
    # use an open cell north-ish: (1,1) is the agent itself; pick (3,1) with facing W
    left_side = env._obs(mk_state(facing=3, skeleton=(3, 1)), key)
    assert float(left_side[1][:7].mean()) > float(left_side[2][:7].mean())


def test_skeleton_visible_only_in_sight():
    key = jax.random.PRNGKey(7)
    in_sight = env._obs(mk_state(facing=1, skeleton=(1, 3)), key)  # ahead, East
    behind = env._obs(mk_state(facing=3, skeleton=(1, 3)), key)  # facing West
    # the skeleton sprite adds bright pixels only when visible
    assert float(in_sight[0].max()) >= float(behind[0].max())
    assert float(in_sight[0].sum()) > float(behind[0].sum())


def test_fire_kills_and_respawns():
    s = mk_state(facing=1, skeleton=(1, 3))  # first skeleton: 1 hit needed
    for i in range(50):
        _, ns, r, d, info = env._step_env(jax.random.PRNGKey(i), s, jnp.int32(FIRE))
        if int(ns.kills) == 1:
            assert float(r) >= 10.0 - 0.02
            assert int(ns.skel_hits) == 0  # reset for the new skeleton
            return
    raise AssertionError("80%-accurate shot never landed in 50 tries")


def test_turns_and_movement():
    s = mk_state(facing=0)
    _, ns, *_ = env._step_env(jax.random.PRNGKey(0), s, jnp.int32(TURN_RIGHT))
    assert int(ns.facing) == 1
    _, ns, *_ = env._step_env(jax.random.PRNGKey(0), s, jnp.int32(TURN_LEFT))
    assert int(ns.facing) == 3
    # forward into open cell moves; into wall stays
    s = mk_state(agent=(1, 1), facing=1)  # East, (1,2) open
    _, ns, *_ = env._step_env(jax.random.PRNGKey(1), s, jnp.int32(FORWARD))
    assert int(ns.agent) in (1 * SIZE + 2, 1 * SIZE + 1)  # may be blocked by pursuit contact


def test_pursuit_moves_closer():
    from mmtrl_tpu.envs.skeleton_assets import cell_tables

    _, dist, _ = cell_tables()
    s = mk_state(agent=(1, 1), skeleton=(9, 9), t=0)
    d0 = dist[int(s.skeleton), int(s.agent)]
    _, ns, *_ = env._step_env(jax.random.PRNGKey(0), s, jnp.int32(4))
    d1 = dist[int(ns.skeleton), int(ns.agent)]
    assert d1 <= d0


def test_vectorized_jit():
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    obs, state = jax.jit(env.v_reset)(keys)
    assert obs.shape == (4, 3, 84, 84)
    obs, state, r, d, info = jax.jit(env.v_step)(
        keys, state, jnp.zeros(4, jnp.int32)
    )
    assert r.shape == (4,)


def test_registry():
    assert make("skeleton_plus").name == "skeleton_plus"
