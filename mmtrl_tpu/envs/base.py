"""Functional, device-resident environment API.

The reference steps host-side python envs one at a time behind
``gym.vector.SyncVectorEnv`` (reference: src/train.py:99-101), crossing the
host/device boundary every step (src/train.py:158-160).  Here an environment
is a pair of pure functions over a PyTree state — ``reset(key)`` and
``step(key, state, action)`` — so the whole vectorized rollout lives inside
one jitted ``lax.scan``: batching is ``jax.vmap``, parallelism is sharding
the env batch over the mesh's data axis, and auto-reset is a ``lax.select``
(mirroring the stateless-handle protocol of the reference's EnvPool XLA path,
cleanrl/ppo_atari_envpool_xla_jax.py:212-229, without the C++ round-trip).
"""

from __future__ import annotations

import abc
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from mmtrl_tpu.envs import spaces

EnvState = Any


@struct.dataclass
class EnvParams:
    """Marker base for per-env static parameter dataclasses."""


@struct.dataclass
class TimeStep:
    obs: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray
    info: Dict[str, jnp.ndarray]


def tree_select(pred: jnp.ndarray, on_true, on_false):
    """Leafwise lax.select between two equal-structure PyTrees."""
    return jax.tree_util.tree_map(
        lambda a, b: jnp.where(
            pred.reshape(pred.shape + (1,) * (a.ndim - pred.ndim)), a, b
        ),
        on_true,
        on_false,
    )


class Environment(abc.ABC):
    """A pure-function environment.

    Subclasses implement ``_reset`` and ``_step_env``; ``step`` adds
    auto-reset (on done, the returned obs/state come from a fresh reset, the
    reward/done from the terminal transition) so rollout scans never branch.
    """

    # ---- to implement -------------------------------------------------
    @abc.abstractmethod
    def _reset(self, key: jax.Array) -> Tuple[jnp.ndarray, EnvState]:
        ...

    @abc.abstractmethod
    def _step_env(
        self, key: jax.Array, state: EnvState, action: jnp.ndarray
    ) -> Tuple[jnp.ndarray, EnvState, jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
        ...

    @property
    @abc.abstractmethod
    def observation_space(self) -> spaces.Box:
        ...

    @property
    @abc.abstractmethod
    def action_space(self):
        ...

    @property
    def name(self) -> str:
        return type(self).__name__

    # ---- provided ------------------------------------------------------
    @property
    def num_actions(self) -> int:
        return self.action_space.n

    def reset(self, key: jax.Array) -> Tuple[jnp.ndarray, EnvState]:
        return self._reset(key)

    def step(
        self, key: jax.Array, state: EnvState, action: jnp.ndarray
    ) -> Tuple[jnp.ndarray, EnvState, jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
        key_step, key_reset = jax.random.split(key)
        obs_st, state_st, reward, done, info = self._step_env(key_step, state, action)
        obs_rs, state_rs = self._reset(key_reset)
        state = tree_select(done, state_rs, state_st)
        obs = jnp.where(
            done.reshape(done.shape + (1,) * (obs_st.ndim - done.ndim)),
            obs_rs,
            obs_st,
        )
        # The TRUE post-transition observation (pre-auto-reset) — gym's
        # final_observation / the reference's real_next_obs
        # (cleanrl/dqn.py rb.add real_next_obs): off-policy buffers store
        # this so truncated episodes bootstrap from the right state.
        # Unused consumers cost nothing (XLA dead-code-eliminates it).
        info = dict(info)
        info["final_obs"] = obs_st
        return obs, state, reward, done, info

    # Vectorized entry points (batch dim 0 on state/action/keys).
    def v_reset(self, keys: jax.Array):
        return jax.vmap(self.reset)(keys)

    def v_step(self, keys: jax.Array, state: EnvState, action: jnp.ndarray):
        return jax.vmap(self.step)(keys, state, action)
