"""Determinism: identical seeds must reproduce identical training metrics —
the TPU-side replacement for the reference's --torch-deterministic knob
(JAX is deterministic by construction; this guards against accidental
nondeterminism in the training pipeline)."""

import jax
import numpy as np

from mmtrl_tpu.algos.ppo import PPOConfig, make_ppo
from mmtrl_tpu.envs import make
from mmtrl_tpu.models import MLPActorCritic


def run(seed):
    env = make("CartPole-v1")
    cfg = PPOConfig(total_timesteps=1024, num_envs=4, num_steps=32,
                    num_minibatches=2, update_epochs=2)
    model = MLPActorCritic(num_actions=env.num_actions)
    init_runner, train_iteration = make_ppo(env, model, cfg)
    runner = init_runner(jax.random.PRNGKey(seed))
    step = jax.jit(train_iteration)
    outs = []
    for _ in range(3):
        runner, metrics = step(runner)
        outs.append(float(metrics["losses/policy_loss"]))
    return outs, float(runner.stats.sum_returns)


def test_same_seed_reproduces():
    a = run(7)
    b = run(7)
    np.testing.assert_array_equal(a[0], b[0])
    assert a[1] == b[1]


def test_different_seed_differs():
    a = run(7)
    c = run(8)
    assert a[0] != c[0]
