"""Gymnasium/MuJoCo host bridge (VERDICT round 1, missing #4).

Real gymnasium envs behind the functional Environment surface through
ordered io_callback, with the SB3 handle_timeout_termination contract
(final_obs / truncated in info).  Skipped when gymnasium is missing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytest.importorskip("gymnasium")

from mmtrl_tpu.envs.gym_bridge import GymPool, make_any  # noqa: E402

HAS_MUJOCO = True
try:
    import mujoco  # noqa: F401
except Exception:
    HAS_MUJOCO = False


def test_make_any_prefers_registry():
    env, is_bridge = make_any("CartPole-v1")
    assert not is_bridge, "pure-JAX CartPole must win over the bridge"


@pytest.mark.skipif(not HAS_MUJOCO, reason="mujoco not installed")
def test_halfcheetah_steps_under_jit_scan():
    env = GymPool("HalfCheetah-v5", num_envs=2, seed=0)

    @jax.jit
    def run(key):
        obs, state = env.v_reset(jax.random.split(key, 2))

        def body(c, _):
            obs, state, key = c
            key, k = jax.random.split(key)
            a = jax.random.uniform(k, (2, 6), minval=-1.0, maxval=1.0)
            obs, state, r, d, info = env.v_step(
                jax.random.split(k, 2), state, a
            )
            return (obs, state, key), (r, d, info["truncated"])

        (obs, _, _), (rs, ds, ts) = jax.lax.scan(
            body, (obs, state, key), None, length=32
        )
        return obs, rs, ds, ts

    obs, rs, ds, ts = run(jax.random.PRNGKey(0))
    assert obs.shape == (2, 17)
    assert bool(jnp.all(jnp.isfinite(rs)))
    env.close()


@pytest.mark.skipif(not HAS_MUJOCO, reason="mujoco not installed")
def test_truncation_contract_final_obs_differs_from_reset_obs():
    # HalfCheetah never terminates; episodes end by 1000-step truncation.
    env = GymPool("HalfCheetah-v5", num_envs=1, seed=0)
    obs, state = env.v_reset(jax.random.split(jax.random.PRNGKey(0), 1))
    a = jnp.zeros((1, 6))
    saw_trunc = False
    for t in range(1005):
        obs, state, r, done, info = env.v_step(
            jax.random.split(jax.random.PRNGKey(t), 1), state, a
        )
        if bool(done[0]):
            saw_trunc = True
            assert bool(info["truncated"][0]), "HalfCheetah end must be truncation"
            # the returned obs is the fresh episode's start; final_obs is the
            # true post-transition state — they must differ
            diff = float(jnp.abs(obs[0] - info["final_obs"][0]).max())
            assert diff > 1e-3
            break
    assert saw_trunc
    env.close()


def test_ppo_continuous_wrap_stack_reports_raw_rewards():
    env = GymPool("Pendulum-v1", num_envs=1, seed=0, wrap="ppo_continuous")
    obs, state = env.v_reset(jax.random.split(jax.random.PRNGKey(0), 1))
    saw_difference = False
    for t in range(60):
        obs, state, r, done, info = env.v_step(
            jax.random.split(jax.random.PRNGKey(t), 1), state,
            jnp.asarray([[0.5]]),
        )
        assert float(jnp.abs(obs).max()) <= 10.0  # obs clip
        if abs(float(r[0]) - float(info["raw_reward"][0])) > 1e-6:
            saw_difference = True
    assert saw_difference, "normalized reward must differ from raw"
    env.close()


def test_dm_control_bridge():
    """dm_control suite through the bridge shim: flat obs, Box actions,
    1000-step time-limit truncation semantics (reference RPO benchmark,
    docs/rl-algorithms/rpo.md:116+)."""
    pytest.importorskip("dm_control")
    from mmtrl_tpu.envs.gym_bridge import GymPool

    pool = GymPool("dm_control/cartpole-balance", 2, seed=3)
    assert pool.observation_space.shape == (5,)
    assert pool._act_space.shape == (1,)
    obs = pool._host_reset()
    assert obs.shape == (2, 5) and np.isfinite(obs).all()
    a = np.zeros((2, 1), np.float32)
    for _ in range(10):
        o, fo, r, rr, d, t = pool._host_step(a)
    assert np.isfinite(o).all() and np.isfinite(r).all()
    pool.close()
