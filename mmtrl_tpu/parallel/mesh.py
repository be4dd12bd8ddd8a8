"""Device mesh + named-sharding utilities.

The reference's distributed story is a special `ppo_atari_multigpu.py`
script: torchrun spawns processes and each minibatch gradient is flattened
and all-reduced over gloo/nccl/mpi (reference:
cleanrl/ppo_atari_multigpu.py:162-163,345-359).  On TPU the collective layer
is XLA itself: every trainer takes a `Mesh`, shards the env/batch dimension
over the ``data`` axis with `NamedSharding`, keeps params replicated (or
sharded over ``model`` for the transformer), and XLA inserts the ICI/DCN
all-reduces during `jit` — data parallelism by construction instead of a
dedicated script.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    axis_sizes: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = (DATA_AXIS,),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a Mesh over all (or the given) devices.

    With no ``axis_sizes`` the full device count goes on the first axis and
    remaining axes get size 1 — single-chip runs become a trivial 1-device
    mesh so the same jitted program covers both cases.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(axis_sizes)) != n:
        raise ValueError(f"mesh {axis_sizes} does not cover {n} devices")
    dev_array = np.asarray(devices).reshape(axis_sizes)
    return Mesh(dev_array, tuple(axis_names))


def data_sharding(mesh: Mesh, ndim: int = 1, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard dim 0 over the data axis, replicate the rest."""
    spec = P(axis, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, axis: str = DATA_AXIS):
    """Device-put a PyTree with dim 0 of every leaf sharded over ``axis``."""

    def put(x):
        return jax.device_put(x, data_sharding(mesh, ndim=max(x.ndim, 1), axis=axis))

    return jax.tree_util.tree_map(put, tree)


def replicate(mesh: Mesh, tree):
    """Device-put a PyTree fully replicated over the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
