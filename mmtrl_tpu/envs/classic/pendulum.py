"""Pendulum-v1, device-resident — the continuous-action smoke target.

The reference's continuous-control algorithms (DDPG/TD3/SAC/PPO-continuous)
run on MuJoCo, whose C engine is host-bound; Pendulum gives the same
continuous Box action surface fully on device so the actor-critic trainers
are exercised end-to-end on TPU.  Constants match gymnasium's Pendulum-v1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from mmtrl_tpu.envs import spaces
from mmtrl_tpu.envs.base import Environment


@struct.dataclass
class PendulumState:
    theta: jnp.ndarray
    theta_dot: jnp.ndarray
    t: jnp.ndarray


def _angle_normalize(x):
    return ((x + jnp.pi) % (2 * jnp.pi)) - jnp.pi


class Pendulum(Environment):
    max_speed = 8.0
    max_torque = 2.0
    dt = 0.05
    g = 10.0
    m = 1.0
    length = 1.0
    max_steps = 200

    def _reset(self, key):
        k1, k2 = jax.random.split(key)
        theta = jax.random.uniform(k1, (), minval=-jnp.pi, maxval=jnp.pi)
        theta_dot = jax.random.uniform(k2, (), minval=-1.0, maxval=1.0)
        state = PendulumState(theta=theta, theta_dot=theta_dot, t=jnp.zeros((), jnp.int32))
        return self._obs(state), state

    def _obs(self, s):
        return jnp.stack(
            [jnp.cos(s.theta), jnp.sin(s.theta), s.theta_dot]
        ).astype(jnp.float32)

    def _step_env(self, key, state, action):
        u = jnp.clip(jnp.asarray(action).reshape(()), -self.max_torque, self.max_torque)
        cost = (
            _angle_normalize(state.theta) ** 2
            + 0.1 * state.theta_dot**2
            + 0.001 * u**2
        )
        new_theta_dot = state.theta_dot + (
            3 * self.g / (2 * self.length) * jnp.sin(state.theta)
            + 3.0 / (self.m * self.length**2) * u
        ) * self.dt
        new_theta_dot = jnp.clip(new_theta_dot, -self.max_speed, self.max_speed)
        new_theta = state.theta + new_theta_dot * self.dt
        new = PendulumState(theta=new_theta, theta_dot=new_theta_dot, t=state.t + 1)
        done = new.t >= self.max_steps  # pure time-limit truncation
        return self._obs(new), new, (-cost).astype(jnp.float32), done, {"truncated": done}

    @property
    def observation_space(self):
        high = jnp.array([1.0, 1.0, self.max_speed])
        return spaces.Box(-high, high, (3,))

    @property
    def action_space(self):
        return spaces.Box(-self.max_torque, self.max_torque, (1,))

    @property
    def name(self):
        return "Pendulum-v1"
