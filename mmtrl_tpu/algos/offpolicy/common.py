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


class AlgoParts(tuple):
    """2-tuple ``(init_runner, train_iteration)`` (backwards compatible with
    every existing call site) that also carries the host-loop hooks as
    attributes: ``chunk_fn``, ``act_explore``, ``act_greedy``,
    ``actor_params``."""

    def __new__(cls, init_runner, train_iteration, **extras):
        self = super().__new__(cls, (init_runner, train_iteration))
        for k, v in extras.items():
            setattr(self, k, v)
        return self


def make_chunk_fn(insert_update, num_keys: int):
    """Device-side half of the host-loop split (see hostloop.py).

    ``insert_update(state, buffer, global_step, transition, keys) ->
    (state, buffer, global_step, metrics_dict)`` is the exact same code the
    scanned device path runs after its env step, so the update math cannot
    drift between the two modes.  The returned ``chunk_fn(runner,
    transitions)`` scans it over a host-collected chunk of transitions
    (leaves shaped ``(chunk, num_envs, ...)``).
    """
    import jax

    def chunk_fn(runner: OffPolicyRunner, transitions):
        def body(carry, tr):
            state, buffer, gs, key = carry
            keys = jax.random.split(key, num_keys + 1)
            state, buffer, gs, metrics = insert_update(
                state, buffer, gs, tr, tuple(keys[1:])
            )
            return (state, buffer, gs, keys[0]), metrics

        (state, buffer, gs, key), ms = jax.lax.scan(
            body,
            (runner.train_state, runner.buffer, runner.global_step, runner.key),
            transitions,
        )
        runner = runner.replace(
            train_state=state, buffer=buffer, global_step=gs, key=key
        )
        last = jax.tree_util.tree_map(lambda x: x[-1], ms)
        return runner, last

    return chunk_fn
