"""MountainCar-v0, device-resident (Moore's classic underpowered car).

Same constants, reward, and 200-step limit as gymnasium's MountainCar-v0
(reference baseline docs/rl-algorithms/ppo.md:103).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from mmtrl_tpu.envs import spaces
from mmtrl_tpu.envs.base import Environment


@struct.dataclass
class MountainCarState:
    position: jnp.ndarray
    velocity: jnp.ndarray
    t: jnp.ndarray


class MountainCar(Environment):
    min_position = -1.2
    max_position = 0.6
    max_speed = 0.07
    goal_position = 0.5
    goal_velocity = 0.0
    force = 0.001
    gravity = 0.0025
    max_steps = 200

    def _reset(self, key):
        pos = jax.random.uniform(key, (), minval=-0.6, maxval=-0.4)
        state = MountainCarState(
            position=pos, velocity=jnp.zeros(()), t=jnp.zeros((), jnp.int32)
        )
        return self._obs(state), state

    def _obs(self, s):
        return jnp.stack([s.position, s.velocity]).astype(jnp.float32)

    def _step_env(self, key, state, action):
        velocity = state.velocity + (action - 1) * self.force + jnp.cos(
            3 * state.position
        ) * (-self.gravity)
        velocity = jnp.clip(velocity, -self.max_speed, self.max_speed)
        position = jnp.clip(
            state.position + velocity, self.min_position, self.max_position
        )
        velocity = jnp.where(
            (position <= self.min_position) & (velocity < 0), 0.0, velocity
        )
        new = MountainCarState(position=position, velocity=velocity, t=state.t + 1)
        terminated = (position >= self.goal_position) & (
            velocity >= self.goal_velocity
        )
        truncated = (new.t >= self.max_steps) & ~terminated
        done = terminated | truncated
        return self._obs(new), new, jnp.float32(-1.0), done, {"truncated": truncated}

    @property
    def observation_space(self):
        low = jnp.array([self.min_position, -self.max_speed])
        high = jnp.array([self.max_position, self.max_speed])
        return spaces.Box(low, high, (2,))

    @property
    def action_space(self):
        return spaces.Discrete(3)

    @property
    def name(self):
        return "MountainCar-v0"
