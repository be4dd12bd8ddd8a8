"""Minimal distribution helpers (categorical / diagonal normal / tanh-normal).

The reference uses torch.distributions; these are the jnp equivalents used
inside jitted trainers.  Categorical sampling matches the reference's JAX
path (Gumbel trick, cleanrl/ppo_atari_envpool_xla_jax.py:285-289).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


# ---- categorical over logits ------------------------------------------------
def categorical_sample(key: jax.Array, logits: jnp.ndarray) -> jnp.ndarray:
    u = jax.random.uniform(key, logits.shape)
    return jnp.argmax(logits - jnp.log(-jnp.log(u)), axis=-1)


def categorical_log_prob(logits: jnp.ndarray, action: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.take_along_axis(logp, action[..., None].astype(jnp.int32), axis=-1)[..., 0]


def categorical_entropy(logits: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.sum(jnp.exp(logp) * logp, axis=-1)


# ---- diagonal gaussian ------------------------------------------------------
def normal_sample(key: jax.Array, mean: jnp.ndarray, log_std: jnp.ndarray) -> jnp.ndarray:
    return mean + jnp.exp(log_std) * jax.random.normal(key, mean.shape)


def normal_log_prob(
    mean: jnp.ndarray, log_std: jnp.ndarray, action: jnp.ndarray
) -> jnp.ndarray:
    var = jnp.exp(2 * log_std)
    logp = -((action - mean) ** 2) / (2 * var) - log_std - 0.5 * jnp.log(2 * jnp.pi)
    return logp.sum(axis=-1)


def normal_entropy(log_std: jnp.ndarray) -> jnp.ndarray:
    return (log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e)).sum(axis=-1)


# ---- tanh-squashed gaussian (SAC) -------------------------------------------
def squashed_normal_sample_log_prob(
    key: jax.Array,
    mean: jnp.ndarray,
    log_std: jnp.ndarray,
    action_scale: jnp.ndarray,
    action_bias: jnp.ndarray,
    eps: float = 1e-6,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (action, log_prob, squashed_mean), the SAC reparameterized
    sample with the tanh-Jacobian correction (reference:
    cleanrl/sac_continuous_action.py:110-140)."""
    x = normal_sample(key, mean, log_std)
    y = jnp.tanh(x)
    action = y * action_scale + action_bias
    var = jnp.exp(2 * log_std)
    logp = -((x - mean) ** 2) / (2 * var) - log_std - 0.5 * jnp.log(2 * jnp.pi)
    logp = logp - jnp.log(action_scale * (1 - y**2) + eps)
    return action, logp.sum(axis=-1), jnp.tanh(mean) * action_scale + action_bias
