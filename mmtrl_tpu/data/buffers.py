"""Device-resident replay buffers.

The reference vendors SB3-style host-side numpy buffers with a python
SegmentTree (reference: cleanrl_utils/buffers.py — SegmentTree:18,
ReplayBuffer:321, PrioritizedReplayBuffer:581).  Here storage lives in HBM
as fixed-shape arrays inside the training state, so add/sample run INSIDE
the jitted step scan: no host round-trip per transition, and the whole
off-policy loop (act -> store -> sample -> TD update) is one XLA program.

The prioritized buffer's sum-tree is a flat (2*capacity,) array; updates
propagate up the log2(capacity) levels with vectorized parent recomputes and
sampling is a batched prefix-sum descent — O(log n) like the reference's
python tree, but over the whole batch in lockstep on the VPU.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import struct


def _next_pow2(n: int) -> int:
    return 1 << (int(n) - 1).bit_length()


@struct.dataclass
class ReplayBuffer:
    """Uniform ring buffer over arbitrary transition PyTrees.

    ``data`` leaves have shape (capacity, ...); ``pos``/``size`` are device
    scalars so the buffer threads through lax.scan carries.
    """

    data: Any
    pos: jnp.ndarray  # () int32 next write index
    size: jnp.ndarray  # () int32 valid entries

    @classmethod
    def create(cls, example: Any, capacity: int) -> "ReplayBuffer":
        data = jax.tree_util.tree_map(
            lambda x: jnp.zeros((capacity,) + jnp.shape(x), jnp.asarray(x).dtype),
            example,
        )
        return cls(
            data=data,
            pos=jnp.zeros((), jnp.int32),
            size=jnp.zeros((), jnp.int32),
        )

    @property
    def capacity(self) -> int:
        return jax.tree_util.tree_leaves(self.data)[0].shape[0]

    def add_batch(self, batch: Any, n: int) -> "ReplayBuffer":
        """Insert ``n`` transitions (leading dim n, static).  Wraparound is
        handled with modular scatter indices."""
        cap = self.capacity
        idx = (self.pos + jnp.arange(n)) % cap
        data = jax.tree_util.tree_map(
            lambda buf, x: buf.at[idx].set(x), self.data, batch
        )
        return self.replace(
            data=data,
            pos=(self.pos + n) % cap,
            size=jnp.minimum(self.size + n, cap),
        )

    def sample(self, key: jax.Array, batch_size: int) -> Any:
        idx = jax.random.randint(key, (batch_size,), 0, jnp.maximum(self.size, 1))
        return jax.tree_util.tree_map(lambda buf: buf[idx], self.data)


@struct.dataclass
class SumTree:
    """Flat binary sum-tree: leaves at [capacity, 2*capacity).

    The device equivalent of the reference's SumSegmentTree
    (cleanrl_utils/buffers.py:98-146)."""

    nodes: jnp.ndarray  # (2*capacity,) float32

    @classmethod
    def create(cls, capacity: int) -> "SumTree":
        assert capacity == _next_pow2(capacity), "capacity must be a power of 2"
        return cls(nodes=jnp.zeros(2 * capacity, jnp.float32))

    @property
    def capacity(self) -> int:
        return self.nodes.shape[0] // 2

    @property
    def total(self) -> jnp.ndarray:
        return self.nodes[1]

    def update(self, idx: jnp.ndarray, values: jnp.ndarray) -> "SumTree":
        """Set leaf priorities at ``idx`` (batched) and repair ancestors."""
        cap = self.capacity
        depth = cap.bit_length() - 1
        nodes = self.nodes.at[idx + cap].set(values)
        cur = idx + cap

        def level(_, carry):
            nodes, cur = carry
            parents = cur // 2
            nodes = nodes.at[parents].set(nodes[2 * parents] + nodes[2 * parents + 1])
            return nodes, parents

        nodes, _ = jax.lax.fori_loop(0, depth, level, (nodes, cur))
        return self.replace(nodes=nodes)

    def sample(self, key: jax.Array, batch_size: int) -> jnp.ndarray:
        """Stratified prefix-sum descent; returns leaf indices (batch,)."""
        cap = self.capacity
        depth = cap.bit_length() - 1
        bounds = jnp.arange(batch_size) / batch_size
        u = (
            bounds + jax.random.uniform(key, (batch_size,)) / batch_size
        ) * self.total

        def descend(_, carry):
            node, mass = carry
            left = 2 * node
            left_sum = self.nodes[left]
            go_right = mass >= left_sum
            node = jnp.where(go_right, left + 1, left)
            mass = jnp.where(go_right, mass - left_sum, mass)
            return node, mass

        node0 = jnp.ones(batch_size, jnp.int32)
        node, _ = jax.lax.fori_loop(0, depth, descend, (node0, u))
        return node - cap

    def get(self, idx: jnp.ndarray) -> jnp.ndarray:
        return self.nodes[idx + self.capacity]


@struct.dataclass
class PrioritizedReplayBuffer:
    """PER (Schaul et al.) with α-priorities and β-annealed IS weights —
    the reference's PrioritizedReplayBuffer (cleanrl_utils/buffers.py:581-
    700) rebuilt on the device sum-tree."""

    buffer: ReplayBuffer
    tree: SumTree
    max_priority: jnp.ndarray  # () float32
    alpha: float = struct.field(pytree_node=False, default=0.6)

    @classmethod
    def create(
        cls, example: Any, capacity: int, alpha: float = 0.6
    ) -> "PrioritizedReplayBuffer":
        capacity = _next_pow2(capacity)
        return cls(
            buffer=ReplayBuffer.create(example, capacity),
            tree=SumTree.create(capacity),
            max_priority=jnp.ones(()),
            alpha=alpha,
        )

    def add_batch(self, batch: Any, n: int) -> "PrioritizedReplayBuffer":
        idx = (self.buffer.pos + jnp.arange(n)) % self.buffer.capacity
        new_buf = self.buffer.add_batch(batch, n)
        tree = self.tree.update(
            idx, jnp.full(n, self.max_priority**self.alpha)
        )
        return self.replace(buffer=new_buf, tree=tree)

    def sample(
        self, key: jax.Array, batch_size: int, beta: jnp.ndarray
    ) -> Tuple[Any, jnp.ndarray, jnp.ndarray]:
        """Returns (batch, indices, importance-sampling weights)."""
        idx = self.tree.sample(key, batch_size)
        batch = jax.tree_util.tree_map(lambda buf: buf[idx], self.buffer.data)
        probs = self.tree.get(idx) / jnp.maximum(self.tree.total, 1e-12)
        n = jnp.maximum(self.buffer.size, 1).astype(jnp.float32)
        weights = (n * probs) ** (-beta)
        weights = weights / jnp.maximum(weights.max(), 1e-12)
        return batch, idx, weights

    def update_priorities(
        self, idx: jnp.ndarray, priorities: jnp.ndarray
    ) -> "PrioritizedReplayBuffer":
        priorities = jnp.maximum(priorities, 1e-6)
        tree = self.tree.update(idx, priorities**self.alpha)
        return self.replace(
            tree=tree,
            max_priority=jnp.maximum(self.max_priority, priorities.max()),
        )
