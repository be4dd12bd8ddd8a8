"""Trained-policy evaluation — the reference's cleanrl_utils/evals role.

Runs a policy greedily (or sampling) in the vectorized device env for a
fixed number of steps inside one lax.scan and reports episode statistics.
Works with feedforward ``apply(params, obs) -> (logits, value)`` and
recurrent ``apply(params, obs[T,B], done[T,B], carry)`` models.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from mmtrl_tpu.core.metrics import EpisodeStatistics
from mmtrl_tpu.envs.base import Environment
from mmtrl_tpu.models.distributions import categorical_sample


def evaluate_policy(
    env: Environment,
    apply_fn,
    params,
    key: jax.Array,
    num_envs: int = 16,
    num_steps: int = 256,
    greedy: bool = True,
    recurrent: bool = False,
    initial_carry: Optional[Any] = None,
) -> Dict[str, jnp.ndarray]:
    key, k_reset = jax.random.split(key)
    obs, env_state = env.v_reset(jax.random.split(k_reset, num_envs))
    done = jnp.zeros(num_envs, dtype=bool)
    stats = EpisodeStatistics.create(num_envs)
    carry = initial_carry

    def step(c, _):
        obs, env_state, done, carry, stats, key = c
        key, k_act, k_step = jax.random.split(key, 3)
        if recurrent:
            logits, _, carry = apply_fn(params, obs[None], done[None], carry)
            logits = logits[0]
        else:
            logits, _ = apply_fn(params, obs)
        action = (
            jnp.argmax(logits, axis=-1) if greedy else categorical_sample(k_act, logits)
        )
        obs, env_state, reward, done, _ = env.v_step(
            jax.random.split(k_step, num_envs), env_state, action
        )
        stats = stats.update(reward, done)
        return (obs, env_state, done, carry, stats, key), None

    (obs, env_state, done, carry, stats, key), _ = jax.lax.scan(
        step, (obs, env_state, done, carry, stats, key), None, length=num_steps
    )
    return {
        "eval/episodic_return": stats.mean_return,
        "eval/episodic_length": stats.mean_length,
        "eval/episodes": stats.episode_count,
    }


def evaluate_actions(
    env: Environment,
    act_fn,
    params,
    key: jax.Array,
    num_envs: int = 16,
    num_steps: int = 1000,
) -> Dict[str, jnp.ndarray]:
    """Greedy evaluation generic over the action rule.

    ``act_fn(params, obs, key) -> action`` covers the whole off-policy zoo
    (argmax-Q for DQN/C51, deterministic actor for DDPG/TD3, tanh-mean for
    SAC) — the reference reports training-curve returns only; a final greedy
    eval removes the epsilon/exploration noise from the reported number.
    """
    num_envs = getattr(env, "num_envs", num_envs)  # bridges have a fixed pool
    key, k_reset = jax.random.split(key)
    obs, env_state = env.v_reset(jax.random.split(k_reset, num_envs))
    stats = EpisodeStatistics.create(num_envs)

    def step(c, _):
        obs, env_state, stats, key = c
        key, k_act, k_step = jax.random.split(key, 3)
        action = act_fn(params, obs, k_act)
        obs, env_state, reward, done, info = env.v_step(
            jax.random.split(k_step, num_envs), env_state, action
        )
        reward = info.get("raw_reward", reward)
        stats = stats.update(reward, done)
        return (obs, env_state, stats, key), None

    (obs, env_state, stats, key), _ = jax.lax.scan(
        step, (obs, env_state, stats, key), None, length=num_steps
    )
    return {
        "eval/episodic_return": stats.mean_return,
        "eval/episodic_length": stats.mean_length,
        "eval/episodes": stats.episode_count,
    }
