"""Scan-GAE must exactly equal the reference's backward python loop.

This is the reference's own parity-test pattern
(tests/test_jax_compute_gae.py: scan vs loop on random (T, N) inputs)
re-applied to our implementation against an independent numpy loop
transcribing the CleanRL recurrence (src/train.py:171-189).
"""

import jax.numpy as jnp
import numpy as np

from mmtrl_tpu.ops.gae import compute_gae


def loop_gae(rewards, values, dones, next_value, next_done, gamma, lam):
    T, N = rewards.shape
    advantages = np.zeros_like(rewards)
    lastgaelam = np.zeros(N)
    for t in reversed(range(T)):
        if t == T - 1:
            nextnonterminal = 1.0 - next_done
            nextvalues = next_value
        else:
            nextnonterminal = 1.0 - dones[t + 1]
            nextvalues = values[t + 1]
        delta = rewards[t] + gamma * nextvalues * nextnonterminal - values[t]
        advantages[t] = lastgaelam = (
            delta + gamma * lam * nextnonterminal * lastgaelam
        )
    return advantages, advantages + values


def test_scan_equals_loop():
    rng = np.random.RandomState(0)
    T, N = 123, 7
    rewards = rng.randn(T, N).astype(np.float32)
    values = rng.randn(T, N).astype(np.float32)
    dones = (rng.rand(T, N) < 0.1).astype(np.float32)
    next_value = rng.randn(N).astype(np.float32)
    next_done = (rng.rand(N) < 0.1).astype(np.float32)

    adv_ref, ret_ref = loop_gae(rewards, values, dones, next_value, next_done, 0.99, 0.95)
    adv, ret = compute_gae(
        jnp.asarray(rewards),
        jnp.asarray(values),
        jnp.asarray(dones),
        jnp.asarray(next_value),
        jnp.asarray(next_done),
        0.99,
        0.95,
    )
    np.testing.assert_allclose(np.asarray(adv), adv_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ret), ret_ref, rtol=1e-5, atol=1e-5)
