"""Device-resident decision-transformer evaluation.

Rolls the DT in the vectorized env conditioned on a target return, the
published DT evaluation protocol: maintain shift-register context windows of
(rtg, state, action), predict the next action from the last state token,
decrement the return target by each observed reward.  Entirely inside one
lax.scan — no host round-trips during evaluation.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from mmtrl_tpu.core.metrics import EpisodeStatistics
from mmtrl_tpu.envs.base import Environment
from mmtrl_tpu.models.decision_transformer import DecisionTransformer, DTConfig


def evaluate_dt(
    env: Environment,
    model_cfg: DTConfig,
    params,
    key: jax.Array,
    target_return: float,
    num_envs: int = 16,
    num_steps: int = 64,
    greedy: bool = True,
    rtg_clip: float = None,
) -> Dict[str, jnp.ndarray]:
    """``rtg_clip`` bounds the running return-to-go to the training data's
    support: with negative step rewards ``rt = target - sum(r)`` otherwise
    climbs past any value seen in training (conditioning goes out of
    distribution and the policy degrades)."""
    model = DecisionTransformer(model_cfg)
    K = model_cfg.context_len

    key, k_reset = jax.random.split(key)
    obs, env_state = env.v_reset(jax.random.split(k_reset, num_envs))
    state_shape = obs.shape[1:]

    def shift_append(buf, x):
        return jnp.concatenate([buf[:, 1:], x[:, None]], axis=1)

    init = dict(
        env_state=env_state,
        obs=obs,
        states=jnp.zeros((num_envs, K) + state_shape, obs.dtype),
        actions=jnp.zeros((num_envs, K), jnp.int32),
        rtg=jnp.zeros((num_envs, K), jnp.float32),
        timesteps=jnp.zeros((num_envs, K), jnp.int32),
        t_in_ep=jnp.zeros(num_envs, jnp.int32),
        rt=jnp.full(num_envs, target_return, jnp.float32),
        stats=EpisodeStatistics.create(num_envs),
        key=key,
    )

    def step(carry, _):
        c = dict(carry)
        states = shift_append(c["states"], c["obs"])
        rtg = shift_append(c["rtg"], c["rt"])
        timesteps = shift_append(c["timesteps"], c["t_in_ep"])
        # Action slot for the current step is a placeholder (0): the DT
        # predicts it from the state token, which precedes it causally.
        actions_in = shift_append(c["actions"], jnp.zeros(num_envs, jnp.int32))

        logits = model.apply(
            params, rtg, states, actions_in, timesteps, deterministic=True
        )[:, -1]
        key, k_act, k_step = jax.random.split(c["key"], 3)
        action = (
            jnp.argmax(logits, axis=-1)
            if greedy
            else jax.random.categorical(k_act, logits)
        )
        next_obs, env_state, reward, done, _ = env.v_step(
            jax.random.split(k_step, num_envs), c["env_state"], action
        )
        stats = c["stats"].update(reward, done)
        rt = jnp.where(done, target_return, c["rt"] - reward)
        if rtg_clip is not None:
            rt = jnp.minimum(rt, rtg_clip)
        t_next = jnp.where(done, 0, c["t_in_ep"] + 1)

        # On done, clear the context so the new episode starts fresh.
        def reset_if_done(buf):
            d = done.reshape((num_envs,) + (1,) * (buf.ndim - 1))
            return jnp.where(d, jnp.zeros_like(buf), buf)

        new = dict(
            env_state=env_state,
            obs=next_obs,
            states=reset_if_done(states),
            actions=reset_if_done(shift_append(c["actions"], action)),
            rtg=reset_if_done(rtg),
            timesteps=reset_if_done(timesteps),
            t_in_ep=t_next,
            rt=rt,
            stats=stats,
            key=key,
        )
        return new, None

    final, _ = jax.lax.scan(step, init, None, length=num_steps)
    stats = final["stats"]
    return {
        "eval/episodic_return": stats.mean_return,
        "eval/episodic_length": stats.mean_length,
        "eval/episodes": stats.episode_count,
    }
