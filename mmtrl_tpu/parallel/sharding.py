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
