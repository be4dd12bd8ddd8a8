"""Generalized Advantage Estimation as a single reverse lax.scan.

Replaces the reference's backward python loop (reference: src/train.py:
171-189) with the scan formulation its XLA path already validated
(reference: cleanrl/ppo_atari_envpool_xla_jax_scan.py:298-330, unit-tested
loop-vs-scan at tests/test_jax_compute_gae.py).  One fused XLA program, no
per-timestep dispatch.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def compute_gae(
    rewards: jnp.ndarray,  # (T, N)
    values: jnp.ndarray,  # (T, N)
    dones: jnp.ndarray,  # (T, N) done flag that PRECEDED obs t (CleanRL convention)
    next_value: jnp.ndarray,  # (N,) bootstrap value of obs after step T-1
    next_done: jnp.ndarray,  # (N,)
    gamma: float,
    gae_lambda: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (advantages, returns), each (T, N).

    Semantics match the reference loop: ``dones[t]`` is the done flag that
    *preceded* observation t (CleanRL convention), ``next_done`` the flag
    after the final step.
    """
    dones_f = dones.astype(jnp.float32)

    def body(carry, inp):
        next_adv, nv, nd = carry
        reward, value, done = inp
        delta = reward + gamma * nv * (1.0 - nd) - value
        adv = delta + gamma * gae_lambda * (1.0 - nd) * next_adv
        return (adv, value, done), adv

    init = (jnp.zeros_like(next_value), next_value, next_done.astype(jnp.float32))
    _, advantages = jax.lax.scan(
        body, init, (rewards, values, dones_f), reverse=True
    )
    return advantages, advantages + values
