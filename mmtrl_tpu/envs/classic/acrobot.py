"""Acrobot-v1, device-resident (Sutton's two-link underactuated swing-up).

RK4 integration with the book's dynamics, matching gymnasium's Acrobot-v1
constants and termination; part of the classic-control benchmark set
(reference baseline docs/rl-algorithms/ppo.md:102).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from mmtrl_tpu.envs import spaces
from mmtrl_tpu.envs.base import Environment


@struct.dataclass
class AcrobotState:
    joint: jnp.ndarray  # (4,): theta1, theta2, dtheta1, dtheta2
    t: jnp.ndarray


def _wrap(x, lo, hi):
    return lo + jnp.mod(x - lo, hi - lo)


class Acrobot(Environment):
    dt = 0.2
    link_length_1 = 1.0
    link_mass_1 = 1.0
    link_mass_2 = 1.0
    link_com_1 = 0.5
    link_com_2 = 0.5
    link_moi = 1.0
    max_vel_1 = 4 * jnp.pi
    max_vel_2 = 9 * jnp.pi
    torques = jnp.array([-1.0, 0.0, 1.0])
    max_steps = 500

    def _dsdt(self, augmented):
        m1, m2 = self.link_mass_1, self.link_mass_2
        l1 = self.link_length_1
        lc1, lc2 = self.link_com_1, self.link_com_2
        i1 = i2 = self.link_moi
        g = 9.8
        a = augmented[-1]
        th1, th2, dth1, dth2 = augmented[0], augmented[1], augmented[2], augmented[3]
        d1 = (
            m1 * lc1**2
            + m2 * (l1**2 + lc2**2 + 2 * l1 * lc2 * jnp.cos(th2))
            + i1
            + i2
        )
        d2 = m2 * (lc2**2 + l1 * lc2 * jnp.cos(th2)) + i2
        phi2 = m2 * lc2 * g * jnp.cos(th1 + th2 - jnp.pi / 2.0)
        phi1 = (
            -m2 * l1 * lc2 * dth2**2 * jnp.sin(th2)
            - 2 * m2 * l1 * lc2 * dth2 * dth1 * jnp.sin(th2)
            + (m1 * lc1 + m2 * l1) * g * jnp.cos(th1 - jnp.pi / 2)
            + phi2
        )
        ddth2 = (
            a + d2 / d1 * phi1 - m2 * l1 * lc2 * dth1**2 * jnp.sin(th2) - phi2
        ) / (m2 * lc2**2 + i2 - d2**2 / d1)
        ddth1 = -(d2 * ddth2 + phi1) / d1
        return jnp.stack([dth1, dth2, ddth1, ddth2, jnp.zeros_like(a)])

    def _rk4(self, y0):
        dt = self.dt
        k1 = self._dsdt(y0)
        k2 = self._dsdt(y0 + dt / 2 * k1)
        k3 = self._dsdt(y0 + dt / 2 * k2)
        k4 = self._dsdt(y0 + dt * k3)
        return y0 + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)

    def _reset(self, key):
        joint = jax.random.uniform(key, (4,), minval=-0.1, maxval=0.1)
        state = AcrobotState(joint=joint, t=jnp.zeros((), jnp.int32))
        return self._obs(state), state

    def _obs(self, s: AcrobotState) -> jnp.ndarray:
        th1, th2, d1, d2 = s.joint[0], s.joint[1], s.joint[2], s.joint[3]
        return jnp.stack(
            [jnp.cos(th1), jnp.sin(th1), jnp.cos(th2), jnp.sin(th2), d1, d2]
        ).astype(jnp.float32)

    def _step_env(self, key, state: AcrobotState, action):
        torque = self.torques[action]
        aug = jnp.concatenate([state.joint, torque[None]])
        ns = self._rk4(aug)[:4]
        ns = jnp.stack(
            [
                _wrap(ns[0], -jnp.pi, jnp.pi),
                _wrap(ns[1], -jnp.pi, jnp.pi),
                jnp.clip(ns[2], -self.max_vel_1, self.max_vel_1),
                jnp.clip(ns[3], -self.max_vel_2, self.max_vel_2),
            ]
        )
        new = AcrobotState(joint=ns, t=state.t + 1)
        terminated = -jnp.cos(ns[0]) - jnp.cos(ns[1] + ns[0]) > 1.0
        truncated = (new.t >= self.max_steps) & ~terminated
        done = terminated | truncated
        reward = jnp.where(terminated, 0.0, -1.0).astype(jnp.float32)
        return self._obs(new), new, reward, done, {"truncated": truncated}

    @property
    def observation_space(self):
        high = jnp.array([1.0, 1.0, 1.0, 1.0, self.max_vel_1, self.max_vel_2])
        return spaces.Box(-high, high, (6,))

    @property
    def action_space(self):
        return spaces.Discrete(3)

    @property
    def name(self):
        return "Acrobot-v1"
