"""Pipeline parallelism (the ``pp`` axis): GPipe microbatch schedule.

Layers shard over a ``pipe`` mesh axis — each device holds the parameters
of one STAGE (a contiguous slice of layers) and only ever computes its own
stage, so a model ``pp``× too big for one chip trains with per-chip memory
O(params/pp).  Microbatches stream through the ring: at tick ``t`` stage 0
ingests microbatch ``t`` while stage ``i`` processes the activations
``ppermute``d from stage ``i-1`` — the classic (M + S - 1)-tick GPipe
schedule with bubble fraction (S-1)/(M+S-1).

Pure JAX ops inside ``shard_map``: ``jax.grad`` through the tick scan
generates the reverse-ppermute backward schedule automatically (stage
activations are rematerialized per-stage by XLA as usual).  The reference
has no pipeline equivalent (its largest model is single-GPU); this is
headroom for scaling the DT depth-wise, complementing TP (width-wise,
sharding.py) and FSDP.

Design ref: the scaling-book pipelining recipe (shard stages, ppermute
activations); GPipe (Huang et al., 2019).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _pipeline_local(
    stage_params: Any,  # this device's stage params (leading stage axis stripped)
    microbatches: jnp.ndarray,  # (M, mb, ...) — replicated
    stage_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
    axis_name: str,
    axis_size: int,
) -> jnp.ndarray:
    S = axis_size
    M = microbatches.shape[0]
    my = jax.lax.axis_index(axis_name)
    is_first = my == 0
    is_last = my == S - 1
    perm = [(i, (i + 1) % S) for i in range(S)]
    zero_mb = jnp.zeros_like(microbatches[0])

    def tick(carry, t):
        recv, acc = carry
        # Stage 0 ingests microbatch t (clamped: garbage after t >= M is
        # masked out of the output accumulator); stages i>0 consume what
        # stage i-1 ppermuted over last tick.
        fed = jax.lax.dynamic_index_in_dim(
            microbatches, jnp.minimum(t, M - 1), 0, keepdims=False
        )
        x = jnp.where(is_first, fed, recv)
        y = stage_fn(stage_params, x)
        # The last stage writes its finished microbatch t-(S-1) to the
        # output buffer; everyone else accumulates nothing.
        out_idx = t - (S - 1)
        valid = is_last & (out_idx >= 0) & (out_idx < M)
        acc = jnp.where(
            valid,
            jax.lax.dynamic_update_index_in_dim(
                acc, y, jnp.clip(out_idx, 0, M - 1), 0
            ),
            acc,
        )
        recv = jax.lax.ppermute(y, axis_name, perm)
        return (recv, acc), None

    acc0 = jnp.zeros((M,) + microbatches.shape[1:], microbatches.dtype)
    (_, acc), _ = jax.lax.scan(
        tick, (zero_mb, acc0), jnp.arange(M + S - 1)
    )
    # acc is zeros except on the last stage; the psum replicates the result
    # (cheap relative to the pipelined compute — one output-sized all-reduce).
    return jax.lax.psum(acc, axis_name)


def pipeline_apply(
    stage_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
    stacked_params: Any,  # pytree with leading STAGE axis of size pp
    microbatches: jnp.ndarray,  # (M, mb, ...) microbatched input
    mesh: Mesh,
    *,
    axis_name: str = "pipe",
) -> jnp.ndarray:
    """Run ``microbatches`` through ``pp`` pipeline stages.

    ``stage_fn(params_i, x) -> y`` applies stage ``i``'s layers to one
    microbatch of activations (shape-preserving: every stage consumes and
    produces the same activation shape, the usual transformer-block stack
    contract).  ``stacked_params`` leaves carry a leading axis of size
    ``pp``; shard_map strips it so each device sees only its own stage.
    Returns the (M, mb, ...) outputs, replicated over the pipe axis.
    """
    n = mesh.shape[axis_name]
    param_specs = jax.tree_util.tree_map(
        lambda x: P(axis_name, *([None] * (x.ndim - 1))), stacked_params
    )

    def local(params, mb):
        params = jax.tree_util.tree_map(lambda x: x[0], params)  # strip stage dim
        return _pipeline_local(params, mb, stage_fn, axis_name, n)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(param_specs, P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(stacked_params, microbatches)


def stack_stage_params(param_list) -> Any:
    """Stack per-stage param pytrees (identical structure) along a new
    leading stage axis — the layout ``pipeline_apply`` shards."""
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=0), *param_list
    )
