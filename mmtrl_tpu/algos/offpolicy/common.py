"""Shared structure for the off-policy trainers (DQN/C51/DDPG/TD3/SAC).

The reference's off-policy scripts loop on the host: act, env.step, host
ReplayBuffer.add, then sample+update every train_frequency steps
(reference: cleanrl/dqn.py rollout; §3.4 of SURVEY.md).  Here one jitted
``train_iteration`` scans a chunk of env steps with the device replay buffer
threaded through the carry; updates fire inside the scan under lax.cond on
the global step counter.  Exploration schedules are pure functions of the
on-device step counter.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct

from mmtrl_tpu.core.metrics import EpisodeStatistics


@struct.dataclass
class OffPolicyRunner:
    train_state: Any  # algo-specific TrainState bundle
    buffer: Any
    env_state: Any
    obs: jnp.ndarray
    global_step: jnp.ndarray  # () int32, counts env steps (x num_envs)
    stats: EpisodeStatistics
    key: Any


def linear_epsilon(
    start_e: float, end_e: float, duration: float, step: jnp.ndarray
) -> jnp.ndarray:
    """The reference's linear_schedule for epsilon-greedy (cleanrl/dqn.py)."""
    slope = (end_e - start_e) / duration
    return jnp.maximum(slope * step + start_e, end_e)
