"""Continuous-control normalization wrappers (VERDICT round 1, missing #5).

The reference stacks ClipAction -> NormalizeObservation(+clip) ->
NormalizeReward(+clip) for MuJoCo PPO (cleanrl/ppo_continuous_action.py:
90-94).  Key contract here: normalization STATISTICS persist across
auto-resets (gym wrappers live outside episode boundaries)."""

import jax
import jax.numpy as jnp
import numpy as np

from mmtrl_tpu.envs import make
from mmtrl_tpu.envs.wrappers import ClipAction, NormalizeObservation, NormalizeReward


def rollout(env, steps, key, action=None):
    obs, state = env.reset(key)
    rows = []
    for t in range(steps):
        key, k = jax.random.split(key)
        a = action if action is not None else env.action_space.sample(k)
        obs, state, r, d, info = env.step(k, state, a)
        rows.append((obs, r, d, info, state))
    return rows


def test_clip_action_clips():
    env = ClipAction(make("Pendulum-v1"))
    key = jax.random.PRNGKey(0)
    obs, state = env.reset(key)
    # absurd action must behave exactly like the clipped bound
    _, s1, r1, _, _ = env.step(key, state, jnp.asarray([1e6]))
    _, s2, r2, _, _ = env.step(key, state, jnp.asarray(env.action_space.high))
    assert jnp.allclose(r1, r2)


def test_norm_obs_stats_survive_auto_reset():
    env = NormalizeObservation(make("CartPole-v1"))
    key = jax.random.PRNGKey(1)
    obs, state = env.reset(key)
    counts = []
    for t in range(700):  # CartPole dies fast under constant action
        key, k = jax.random.split(key)
        obs, state, r, done, info = env.step(k, state, jnp.int32(0))
        counts.append(float(state.rms.count))
        assert obs.shape == env.observation_space.shape
        assert float(jnp.abs(obs).max()) <= 10.0
    # the running count must grow monotonically THROUGH episode ends
    assert counts[-1] > 600, "stats were reset by auto-reset"
    assert all(b >= a for a, b in zip(counts, counts[1:]))


def test_norm_reward_scales_and_reports_raw():
    env = NormalizeReward(make("Pendulum-v1"), gamma=0.99)
    key = jax.random.PRNGKey(2)
    obs, state = env.reset(key)
    raws, scaleds = [], []
    for t in range(250):  # crosses the 200-step truncation boundary
        key, k = jax.random.split(key)
        obs, state, r, done, info = env.step(k, state, jnp.asarray([0.0]))
        raws.append(float(info["raw_reward"]))
        scaleds.append(float(r))
    assert np.std(scaleds) < np.std(raws) or np.std(raws) < 1e-6
    assert max(abs(s) for s in scaleds) <= 10.0
    assert any(r != s for r, s in zip(raws, scaleds))


def test_wrapped_stack_jits_under_scan():
    env = NormalizeReward(NormalizeObservation(ClipAction(make("Pendulum-v1"))))
    key = jax.random.PRNGKey(3)

    @jax.jit
    def run(key):
        obs, state = env.v_reset(jax.random.split(key, 2))

        def body(c, _):
            obs, state, key = c
            key, k = jax.random.split(key)
            a = jnp.zeros((2, 1))
            obs, state, r, d, info = env.v_step(jax.random.split(k, 2), state, a)
            return (obs, state, key), r

        (_, _, _), rs = jax.lax.scan(body, (obs, state, key), None, length=16)
        return rs

    rs = run(key)
    assert rs.shape == (16, 2)
    assert bool(jnp.all(jnp.isfinite(rs)))
