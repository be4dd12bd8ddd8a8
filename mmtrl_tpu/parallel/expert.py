"""Expert parallelism (the ``expert`` / ep axis).

Shard the stacked-expert parameters of an MoE FFN (models/moe.py) over a
mesh axis: each device holds ``E/n`` experts, runs the identical
dense-dispatch einsums on its local slice, and a single ``psum`` (ICI
all-reduce) sums the partial combines into the full output.  Tokens and the
router stay replicated — at this repo's scales the expert FFN weights are
the memory/FLOP mass, and sharding them is what lets expert count scale
with chips.

Exactness: because the combine weights of non-local experts are zero in a
device's partial sum, the psum of partials equals the single-device dense
MoE bit-for-bit in f32 (tests/test_moe.py asserts value AND gradient
equality; the driver dryrun re-checks it on every run).

The reference has no distributed-FFN counterpart (torch Linears on one
GPU); design follows the GShard/Switch expert-sharding recipe and the
scaling-book collective pattern: shard a named axis, compute locally, psum.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mmtrl_tpu.models.moe import moe_ffn_dense

EXPERT_AXIS = "expert"


def moe_param_specs(params) -> dict:
    """PartitionSpec tree for an MoEFFN param dict: stacked ``experts_*``
    tensors shard their leading E axis over ``expert``; the router gate is
    replicated."""

    def spec(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name.startswith("experts_"):
            return P(EXPERT_AXIS, *([None] * (leaf.ndim - 1)))
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def _local_moe(x, combine, w1, b1, w2, b2, *, axis_name):
    # My E/n experts' partial combine; zeros elsewhere in `combine` make the
    # all-reduce exact.
    y = moe_ffn_dense(x, combine, w1, b1, w2, b2)
    return jax.lax.psum(y, axis_name)


def expert_parallel_moe(
    x: jnp.ndarray,  # (B, S, D) replicated
    combine: jnp.ndarray,  # (B, S, E) from moe_combine_weights
    w1: jnp.ndarray,  # (E, D, F)
    b1: jnp.ndarray,  # (E, F)
    w2: jnp.ndarray,  # (E, F, D)
    b2: jnp.ndarray,  # (E, D)
    mesh: Mesh,
    axis_name: str = EXPERT_AXIS,
) -> jnp.ndarray:
    """Run the MoE FFN with experts sharded over ``axis_name``.

    ``E`` must divide by the axis size.  Inputs may arrive with any
    sharding; the shard_map specs pin expert-stacked operands to the expert
    axis and replicate the rest (XLA inserts layout moves as needed).
    """
    n = mesh.shape[axis_name]
    E = combine.shape[-1]
    assert E % n == 0, f"{E} experts not divisible by expert axis {n}"
    rep = P()
    exp0 = lambda ndim: P(axis_name, *([None] * (ndim - 1)))  # noqa: E731
    fn = jax.shard_map(
        functools.partial(_local_moe, axis_name=axis_name),
        mesh=mesh,
        in_specs=(
            rep,  # x replicated
            P(None, None, axis_name),  # combine split over experts
            exp0(3),
            exp0(2),
            exp0(3),
            exp0(2),
        ),
        out_specs=rep,
        check_vma=False,
    )
    out = fn(x, combine, w1, b1, w2, b2)
    return jax.lax.with_sharding_constraint(out, NamedSharding(mesh, rep))
