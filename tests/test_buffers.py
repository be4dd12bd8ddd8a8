"""Replay buffer tests: ring semantics, sum-tree golden values, PER
distribution — covering the reference's SegmentTree/PrioritizedReplayBuffer
behavior (cleanrl_utils/buffers.py:18-180,581-700) on the device rebuild."""

import jax
import jax.numpy as jnp
import numpy as np

from mmtrl_tpu.data import PrioritizedReplayBuffer, ReplayBuffer, SumTree


def test_ring_buffer_wraparound():
    example = dict(x=jnp.zeros(2), y=jnp.int32(0))
    buf = ReplayBuffer.create(example, capacity=4)
    for i in range(6):
        batch = dict(x=jnp.full((1, 2), float(i)), y=jnp.full((1,), i, jnp.int32))
        buf = buf.add_batch(batch, 1)
    assert int(buf.size) == 4
    assert int(buf.pos) == 2
    # Oldest entries (0, 1) overwritten by (4, 5).
    ys = sorted(np.asarray(buf.data["y"]).tolist())
    assert ys == [2, 3, 4, 5]


def test_ring_buffer_batched_add_and_sample():
    example = dict(x=jnp.zeros(3))
    buf = ReplayBuffer.create(example, capacity=8)
    buf = buf.add_batch(dict(x=jnp.arange(12, dtype=jnp.float32).reshape(4, 3)), 4)
    out = buf.sample(jax.random.PRNGKey(0), 16)
    assert out["x"].shape == (16, 3)
    # Only inserted rows can be sampled (size=4).
    rows = {tuple(r) for r in np.asarray(out["x"]).tolist()}
    valid = {tuple(r) for r in np.arange(12, dtype=np.float32).reshape(4, 3).tolist()}
    assert rows <= valid


def test_sumtree_total_and_update():
    tree = SumTree.create(8)
    tree = tree.update(jnp.array([0, 3, 7]), jnp.array([1.0, 2.0, 3.0]))
    assert float(tree.total) == 6.0
    tree = tree.update(jnp.array([3]), jnp.array([5.0]))
    assert float(tree.total) == 9.0
    np.testing.assert_allclose(
        np.asarray(tree.get(jnp.array([0, 3, 7]))), [1.0, 5.0, 3.0]
    )


def test_sumtree_sampling_distribution():
    tree = SumTree.create(4)
    tree = tree.update(jnp.arange(4), jnp.array([1.0, 0.0, 3.0, 0.0]))
    idx = np.asarray(tree.sample(jax.random.PRNGKey(0), 4000))
    counts = np.bincount(idx, minlength=4) / 4000
    np.testing.assert_allclose(counts, [0.25, 0.0, 0.75, 0.0], atol=0.03)


def test_per_end_to_end():
    example = dict(x=jnp.zeros(1))
    per = PrioritizedReplayBuffer.create(example, capacity=8, alpha=1.0)
    per = per.add_batch(dict(x=jnp.arange(8, dtype=jnp.float32).reshape(8, 1)), 8)
    # Skew priorities hard to index 5.
    per = per.update_priorities(jnp.arange(8), jnp.array([0, 0, 0, 0, 0, 100, 0, 0.0]) + 1e-3)
    batch, idx, weights = per.sample(jax.random.PRNGKey(1), 256, beta=jnp.asarray(0.4))
    assert (np.asarray(idx) == 5).mean() > 0.9
    assert weights.shape == (256,)
    assert float(weights.max()) <= 1.0 + 1e-6
    # IS weight of the over-sampled element is the smallest.
    w5 = np.asarray(weights)[np.asarray(idx) == 5]
    assert w5.max() <= np.asarray(weights).max()
