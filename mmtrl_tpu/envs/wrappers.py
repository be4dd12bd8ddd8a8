"""Functional env wrappers.

The reference composes stateful gym/SB3 wrappers in make_env thunks
(reference: src/train.py:29-64) and a CASL frame/audio stacking wrapper
(src/environments/casl_environment.py:42-94).  Device-resident envs can't
hold python state, so wrappers here are Environment subclasses that extend
the state PyTree — still pure functions, still scan/vmap-able.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from mmtrl_tpu.envs.base import Environment, EnvState


class ClipReward(Environment):
    """Sign-clip rewards like SB3's ClipRewardEnv (reference: src/train.py:57,
    flag --clip-rewards at src/utils.py:123-124).  Episode statistics should
    be accumulated from the `raw_reward` info field."""

    def __init__(self, env: Environment):
        self.env = env

    def _reset(self, key):
        return self.env._reset(key)

    def _step_env(self, key, state, action):
        obs, state, reward, done, info = self.env._step_env(key, state, action)
        info = dict(info, raw_reward=reward)
        return obs, state, jnp.sign(reward), done, info

    @property
    def observation_space(self):
        return self.env.observation_space

    @property
    def action_space(self):
        return self.env.action_space

    @property
    def name(self):
        return self.env.name


@struct.dataclass
class StackState:
    inner: EnvState
    frames: jnp.ndarray  # (k, C, H, W) newest last


class FrameStack(Environment):
    """Stack the last k observations along a leading axis then flatten into
    channels, the CASL queue pattern (casl_environment.py:42-94) without the
    host-side deque: the stack is part of the env state PyTree."""

    def __init__(self, env: Environment, k: int = 4):
        self.env = env
        self.k = k

    def _reset(self, key):
        obs, inner = self.env._reset(key)
        frames = jnp.repeat(obs[None], self.k, axis=0)
        return self._stack_obs(frames), StackState(inner=inner, frames=frames)

    def _stack_obs(self, frames: jnp.ndarray) -> jnp.ndarray:
        return frames.reshape((-1,) + frames.shape[2:])

    def _step_env(self, key, state: StackState, action):
        obs, inner, reward, done, info = self.env._step_env(
            key, state.inner, action
        )
        frames = jnp.concatenate([state.frames[1:], obs[None]], axis=0)
        new = StackState(inner=inner, frames=frames)
        return self._stack_obs(frames), new, reward, done, info

    @property
    def observation_space(self):
        sp = self.env.observation_space
        shape = (sp.shape[0] * self.k,) + tuple(sp.shape[1:])
        return type(sp)(sp.low, sp.high, shape)

    @property
    def action_space(self):
        return self.env.action_space

    @property
    def name(self):
        return self.env.name


@struct.dataclass
class RunningStat:
    mean: jnp.ndarray
    var: jnp.ndarray
    count: jnp.ndarray

    @classmethod
    def create(cls, shape: Tuple[int, ...]) -> "RunningStat":
        return cls(
            mean=jnp.zeros(shape),
            var=jnp.ones(shape),
            count=jnp.asarray(1e-4),
        )

    def update(self, batch: jnp.ndarray) -> "RunningStat":
        """Welford/parallel-variance batch update (the RunningMeanStd the
        reference uses for RND and continuous PPO normalization, reference:
        cleanrl/ppo_rnd_envpool.py:239-263)."""
        b_mean = batch.mean(axis=0)
        b_var = batch.var(axis=0)
        b_count = batch.shape[0]
        delta = b_mean - self.mean
        tot = self.count + b_count
        new_mean = self.mean + delta * b_count / tot
        m_a = self.var * self.count
        m_b = b_var * b_count
        m2 = m_a + m_b + delta**2 * self.count * b_count / tot
        return RunningStat(mean=new_mean, var=m2 / tot, count=tot)

    def normalize(self, x: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
        return (x - self.mean) / jnp.sqrt(self.var + eps)


@struct.dataclass
class NormObsState:
    inner: EnvState
    rms: RunningStat


class ClipAction(Environment):
    """Clip continuous actions to the action-space bounds (reference:
    gym.wrappers.ClipAction in cleanrl/ppo_continuous_action.py:90)."""

    def __init__(self, env: Environment):
        self.env = env
        self._low = jnp.asarray(env.action_space.low)
        self._high = jnp.asarray(env.action_space.high)

    def reset(self, key):
        return self.env.reset(key)

    def step(self, key, state, action):
        return self.env.step(key, state, jnp.clip(action, self._low, self._high))

    # underscore API delegates so further wrapping keeps working
    def _reset(self, key):
        return self.env._reset(key)

    def _step_env(self, key, state, action):
        return self.env._step_env(
            key, state, jnp.clip(action, self._low, self._high)
        )

    @property
    def observation_space(self):
        return self.env.observation_space

    @property
    def action_space(self):
        return self.env.action_space

    @property
    def name(self):
        return self.env.name


class NormalizeObservation(Environment):
    """Running mean/var observation normalization + clip, the reference's
    gym.wrappers.NormalizeObservation + TransformObservation clip
    (cleanrl/ppo_continuous_action.py:91-92).

    Statistics persist across episodes, so this wrapper handles auto-reset
    by delegating to the INNER env's ``step`` (whose tree_select only
    touches the inner state) — wrap it outermost, and don't reach through
    ``_step_env`` from above.
    """

    def __init__(self, env: Environment, clip: float = 10.0):
        self.env = env
        self.clip = clip

    def _norm(self, rms: RunningStat, obs: jnp.ndarray) -> jnp.ndarray:
        return jnp.clip(rms.normalize(obs), -self.clip, self.clip)

    def reset(self, key):
        obs, inner = self.env.reset(key)
        rms = RunningStat.create(obs.shape).update(obs[None])
        return self._norm(rms, obs), NormObsState(inner=inner, rms=rms)

    def step(self, key, state: NormObsState, action):
        obs, inner, reward, done, info = self.env.step(key, state.inner, action)
        rms = state.rms.update(obs[None])
        return (
            self._norm(rms, obs),
            NormObsState(inner=inner, rms=rms),
            reward,
            done,
            info,
        )

    _reset = reset
    _step_env = step

    @property
    def observation_space(self):
        sp = self.env.observation_space
        return type(sp)(-self.clip, self.clip, sp.shape)

    @property
    def action_space(self):
        return self.env.action_space

    @property
    def name(self):
        return self.env.name


@struct.dataclass
class NormRewardState:
    inner: EnvState
    rms: RunningStat  # variance of the discounted return
    ret: jnp.ndarray  # () running discounted return


class NormalizeReward(Environment):
    """Scale rewards by the std of the discounted return + clip, the
    reference's gym.wrappers.NormalizeReward + TransformReward clip
    (cleanrl/ppo_continuous_action.py:93-94).  Same auto-reset contract as
    NormalizeObservation: statistics persist across episodes."""

    def __init__(self, env: Environment, gamma: float = 0.99, clip: float = 10.0):
        self.env = env
        self.gamma = gamma
        self.clip = clip

    def reset(self, key):
        obs, inner = self.env.reset(key)
        return obs, NormRewardState(
            inner=inner, rms=RunningStat.create(()), ret=jnp.zeros(())
        )

    def step(self, key, state: NormRewardState, action):
        obs, inner, reward, done, info = self.env.step(key, state.inner, action)
        ret = state.ret * self.gamma + reward
        rms = state.rms.update(ret[None])
        ret = jnp.where(done, 0.0, ret)
        scaled = jnp.clip(
            reward / jnp.sqrt(rms.var + 1e-8), -self.clip, self.clip
        )
        info = dict(info, raw_reward=reward)
        return (
            obs,
            NormRewardState(inner=inner, rms=rms, ret=ret),
            scaled.astype(jnp.float32),
            done,
            info,
        )

    _reset = reset
    _step_env = step

    @property
    def observation_space(self):
        return self.env.observation_space

    @property
    def action_space(self):
        return self.env.action_space

    @property
    def name(self):
        return self.env.name
