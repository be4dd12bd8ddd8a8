"""evaluate_policy tests: greedy rollouts, recurrent carry threading, and
statistics over all completed episodes."""

import jax
import jax.numpy as jnp
import numpy as np

from mmtrl_tpu.envs import make
from mmtrl_tpu.models import MLPActorCritic, MultimodalRecurrentAgent
from mmtrl_tpu.utils.evaluate import evaluate_policy


def test_feedforward_eval():
    env = make("CartPole-v1")
    model = MLPActorCritic(num_actions=2)
    key = jax.random.PRNGKey(0)
    obs, _ = env.reset(key)
    params = model.init(key, obs[None])
    out = jax.jit(
        lambda k: evaluate_policy(env, model.apply, params, k, num_envs=4, num_steps=64)
    )(key)
    assert int(out["eval/episodes"]) > 0
    assert np.isfinite(float(out["eval/episodic_return"]))
    # CartPole returns equal lengths
    assert float(out["eval/episodic_return"]) == float(out["eval/episodic_length"])


def test_recurrent_eval():
    env = make("minecraft")
    model = MultimodalRecurrentAgent(num_actions=4, conv_type="small")
    key = jax.random.PRNGKey(0)
    obs, _ = env.reset(key)
    carry = model.initial_carry(2)
    params = model.init(key, obs[None, None], jnp.zeros((1, 1)), model.initial_carry(1))
    out = jax.jit(
        lambda k: evaluate_policy(
            env, model.apply, params, k, num_envs=2, num_steps=40,
            recurrent=True, initial_carry=carry,
        )
    )(key)
    assert int(out["eval/episodes"]) >= 2  # 30-step limit forces episodes
