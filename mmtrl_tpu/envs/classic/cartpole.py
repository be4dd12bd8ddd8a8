"""CartPole-v1, device-resident (standard Barto-Sutton-Anderson dynamics).

Covers the reference's CPU-benchmarked classic-control path (reference:
cleanrl/ppo.py via gym's CartPole; baseline docs/rl-algorithms/ppo.md:101).
Euler integration, same constants and termination thresholds as gymnasium's
CartPole-v1; the 500-step time limit is folded into ``done``.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from mmtrl_tpu.envs import spaces
from mmtrl_tpu.envs.base import Environment


@struct.dataclass
class CartPoleState:
    x: jnp.ndarray
    x_dot: jnp.ndarray
    theta: jnp.ndarray
    theta_dot: jnp.ndarray
    t: jnp.ndarray


class CartPole(Environment):
    gravity = 9.8
    masscart = 1.0
    masspole = 0.1
    total_mass = masscart + masspole
    length = 0.5
    polemass_length = masspole * length
    force_mag = 10.0
    tau = 0.02
    theta_threshold = 12 * 2 * jnp.pi / 360
    x_threshold = 2.4
    max_steps = 500

    def _reset(self, key):
        vals = jax.random.uniform(key, (4,), minval=-0.05, maxval=0.05)
        state = CartPoleState(
            x=vals[0],
            x_dot=vals[1],
            theta=vals[2],
            theta_dot=vals[3],
            t=jnp.zeros((), jnp.int32),
        )
        return self._obs(state), state

    def _obs(self, s: CartPoleState) -> jnp.ndarray:
        return jnp.stack([s.x, s.x_dot, s.theta, s.theta_dot]).astype(jnp.float32)

    def _step_env(
        self, key, state: CartPoleState, action
    ) -> Tuple[jnp.ndarray, CartPoleState, jnp.ndarray, jnp.ndarray, Dict]:
        force = jnp.where(action == 1, self.force_mag, -self.force_mag)
        costh = jnp.cos(state.theta)
        sinth = jnp.sin(state.theta)
        temp = (
            force + self.polemass_length * state.theta_dot**2 * sinth
        ) / self.total_mass
        theta_acc = (self.gravity * sinth - costh * temp) / (
            self.length * (4.0 / 3.0 - self.masspole * costh**2 / self.total_mass)
        )
        x_acc = temp - self.polemass_length * theta_acc * costh / self.total_mass

        new = CartPoleState(
            x=state.x + self.tau * state.x_dot,
            x_dot=state.x_dot + self.tau * x_acc,
            theta=state.theta + self.tau * state.theta_dot,
            theta_dot=state.theta_dot + self.tau * theta_acc,
            t=state.t + 1,
        )
        terminated = (
            (jnp.abs(new.x) > self.x_threshold)
            | (jnp.abs(new.theta) > self.theta_threshold)
        )
        truncated = (new.t >= self.max_steps) & ~terminated
        done = terminated | truncated
        reward = jnp.float32(1.0)
        # "truncated" lets off-policy buffers bootstrap through the time
        # limit (the reference's SB3 handle_timeout_termination).
        return self._obs(new), new, reward, done, {"truncated": truncated}

    @property
    def observation_space(self):
        high = jnp.array([4.8, jnp.inf, 0.42, jnp.inf])
        return spaces.Box(-high, high, (4,))

    @property
    def action_space(self):
        return spaces.Discrete(2)

    @property
    def name(self):
        return "CartPole-v1"
