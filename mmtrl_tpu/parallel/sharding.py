"""Parameter sharding rules for the decision transformer (tensor parallel).

Megatron-style TP over the ``model`` mesh axis: attention QKV and MLP
up-projections are column-parallel (output dim sharded), attention output
and MLP down-projections are row-parallel (input dim sharded); XLA inserts
the all-reduce after each row-parallel matmul.  Everything else (embeddings,
layernorms, heads, CNN towers) replicates — at MMTRL model sizes TP is
optional headroom, DP over ``data`` is the workhorse (SURVEY.md §2.4).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mmtrl_tpu.parallel.mesh import MODEL_AXIS


def _dt_spec(path: tuple, leaf: Any) -> P:
    names = [getattr(p, "key", str(p)) for p in path]
    joined = "/".join(names)
    if "attn" in joined and "qkv" in joined and names[-1] == "kernel":
        return P(None, MODEL_AXIS)  # column-parallel
    if "attn" in joined and "qkv" in joined and names[-1] == "bias":
        return P(MODEL_AXIS)
    if "attn" in joined and names[-2:] == ["out", "kernel"]:
        return P(MODEL_AXIS, None)  # row-parallel
    if names[-2:] == ["fc", "kernel"]:
        return P(None, MODEL_AXIS)
    if names[-2:] == ["fc", "bias"]:
        return P(MODEL_AXIS)
    if "block" in joined and names[-2:] == ["proj", "kernel"]:
        return P(MODEL_AXIS, None)
    return P()


def dt_param_sharding(mesh: Mesh, params) -> Any:
    """NamedSharding PyTree matching ``params`` for TP over ``model``."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    shardings = [NamedSharding(mesh, _dt_spec(path, leaf)) for path, leaf in flat]
    return jax.tree_util.tree_unflatten(treedef, shardings)


def shard_dt_params(mesh: Mesh, params):
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), params, dt_param_sharding(mesh, params)
    )


# ---- FSDP (ZeRO-3 style) ---------------------------------------------------
#
# Parameters shard over the DATA axis (each chip holds 1/N of every large
# tensor); XLA's sharding propagation inserts the per-layer all-gather before
# use and the reduce-scatter on gradients — the FSDP schedule without any
# manual collectives.  Worth it when params+optimizer don't fit replicated;
# at MMTRL sizes it's validated headroom (tests/test_parallel.py).


def _fsdp_spec(leaf: Any, axis_size: int, axis: str, min_size: int) -> P:
    shape = getattr(leaf, "shape", ())
    if not shape or leaf.size < min_size:
        return P()  # small tensors: replication is cheaper than gathering
    # Shard the largest dimension divisible by the axis size.
    dims = sorted(range(len(shape)), key=lambda d: -shape[d])
    for d in dims:
        if shape[d] % axis_size == 0:
            spec = [None] * len(shape)
            spec[d] = axis
            return P(*spec)
    return P()


def fsdp_param_sharding(
    mesh: Mesh,
    params,
    axis: str = "data",
    min_size: int = 2**14,
) -> Any:
    """NamedSharding PyTree sharding every large leaf over ``axis``."""
    axis_size = mesh.shape[axis]
    return jax.tree_util.tree_map(
        lambda leaf: NamedSharding(mesh, _fsdp_spec(leaf, axis_size, axis, min_size)),
        params,
    )


def shard_fsdp_params(mesh: Mesh, params, axis: str = "data"):
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s),
        params,
        fsdp_param_sharding(mesh, params, axis=axis),
    )
