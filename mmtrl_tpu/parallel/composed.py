"""Composed parallelism: data x pipeline x expert in ONE program.

The per-axis modules (parallel/{pipeline,expert,sharding}.py) each validate
one mesh axis in isolation; real deployments compose them, and the
composition is where sharding bugs live — a psum over the wrong axis, a
transpose that forgets a replicated dimension, a stage boundary that breaks
the expert slice.  This module runs a GPipe microbatch schedule whose
stages are residual MoE-FFN blocks, inside a single ``shard_map`` over a
three-axis mesh:

- ``data``    — the microbatch stream is split: each data shard pushes its
  own M/dp microbatches through a full pipeline replica; parameter
  gradients psum over ``data`` in the backward (data parallelism).
- ``pipe``    — block parameters carry a leading stage axis sharded over
  ``pipe``; activations ``ppermute`` stage-to-stage through the
  (M + S - 1)-tick GPipe schedule (pipeline._pipeline_local, reused
  verbatim — the schedule is axis-name-parametric by design).
- ``expert``  — each stage's stacked expert FFN weights shard their E axis
  over ``expert``; the router (tiny, f32) stays replicated, each device
  computes its local experts' partial combine, one psum over ``expert``
  completes the block output (the parallel/expert.py recipe inlined at
  stage granularity).

Exactness contract: in f32 the composed program equals the single-device
dense stack bit-for-bit up to reduction order (tests/test_composed.py
asserts value AND grads; the driver dryrun re-checks one train step and a
50-step convergence loop on the virtual mesh every run).

The reference has no multi-axis counterpart (single-GPU torch, nccl DP at
most — cleanrl/ppo_atari_multigpu.py:129); design follows the scaling-book
composition recipe: one mesh, every collective named by axis.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from mmtrl_tpu.models.moe import moe_combine_weights, moe_ffn_dense
from mmtrl_tpu.parallel.pipeline import _pipeline_local

DATA_AXIS = "data"
PIPE_AXIS = "pipe"
EXPERT_AXIS = "expert"


def init_moe_stack_params(
    key: jax.Array, pp: int, E: int, D: int, F: int
) -> dict:
    """Per-stage residual MoE block parameters, stage axis leading.

    ``experts_*`` leaves are (pp, E, ...) — stage axis shards over ``pipe``,
    expert axis over ``expert``; the router gate (pp, D, E) shards over
    ``pipe`` only (replicated over ``expert``: every device routes over the
    full E so its local combine slice is consistent).
    """
    ks = jax.random.split(key, 5)
    s = lambda k, shape, scale: jax.random.normal(k, shape, jnp.float32) * scale  # noqa: E731
    return {
        "gate_w": s(ks[0], (pp, D, E), 0.3),
        "gate_b": jnp.zeros((pp, E), jnp.float32),
        "experts_w1": s(ks[1], (pp, E, D, F), 0.3),
        "experts_b1": jnp.zeros((pp, E, F), jnp.float32),
        "experts_w2": s(ks[2], (pp, E, F, D), 0.3),
        "experts_b2": jnp.zeros((pp, E, D), jnp.float32),
    }


def moe_stack_param_specs(params: dict) -> dict:
    """PartitionSpecs for init_moe_stack_params output: stage axis on
    ``pipe``; expert-stacked tensors additionally shard E over ``expert``."""

    def spec(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name.startswith("experts_"):
            return P(PIPE_AXIS, EXPERT_AXIS, *([None] * (leaf.ndim - 2)))
        return P(PIPE_AXIS, *([None] * (leaf.ndim - 1)))

    return jax.tree_util.tree_map_with_path(spec, params)


def _moe_stage_fn(params: dict, x: jnp.ndarray, *, top_k: int) -> jnp.ndarray:
    """One pipeline stage: x + MoE_FFN(x), experts sharded over ``expert``.

    ``params`` leaves have the stage axis already stripped; ``experts_*``
    hold only this device's E/ep slice.  The router computes the full-E
    combine from the replicated gate, then slices its local window — the
    non-local combine mass lives on other devices, so the psum over
    ``expert`` reassembles the exact dense output.
    """
    logits = x.astype(jnp.float32) @ params["gate_w"] + params["gate_b"]
    combine = moe_combine_weights(logits, top_k)  # (mb, S, E) full E
    e_local = params["experts_w1"].shape[0]
    start = jax.lax.axis_index(EXPERT_AXIS) * e_local
    local_combine = jax.lax.dynamic_slice_in_dim(
        combine, start, e_local, axis=-1
    )
    y = moe_ffn_dense(
        x,
        local_combine.astype(x.dtype),
        params["experts_w1"],
        params["experts_b1"],
        params["experts_w2"],
        params["experts_b2"],
    )
    return x + jax.lax.psum(y, EXPERT_AXIS)


def composed_moe_pipeline_apply(
    params: dict,  # init_moe_stack_params layout
    microbatches: jnp.ndarray,  # (M, mb, S, D); M divisible by dp
    mesh: Mesh,
    *,
    top_k: int = 2,
) -> jnp.ndarray:
    """Run microbatches through the MoE-block pipeline on a
    (data, pipe, expert) mesh — one shard_map, all three axes live."""
    pp = mesh.shape[PIPE_AXIS]
    dp = mesh.shape[DATA_AXIS]
    assert microbatches.shape[0] % dp == 0, (
        f"{microbatches.shape[0]} microbatches not divisible by data={dp}"
    )
    stage_fn = functools.partial(_moe_stage_fn, top_k=top_k)

    def local(p: Any, mbs: jnp.ndarray) -> jnp.ndarray:
        p = jax.tree_util.tree_map(lambda x: x[0], p)  # strip stage dim
        return _pipeline_local(p, mbs, stage_fn, PIPE_AXIS, pp)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(moe_stack_param_specs(params), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
        check_vma=False,
    )
    return fn(params, microbatches)


def dense_moe_pipeline_reference(
    params: dict, microbatches: jnp.ndarray, *, top_k: int = 2
) -> jnp.ndarray:
    """Single-device oracle: the same stage math, python-looped over stages,
    vmapped over microbatches — no mesh, no collectives."""
    pp = params["gate_w"].shape[0]

    def block(x, s):
        logits = (
            x.astype(jnp.float32) @ params["gate_w"][s] + params["gate_b"][s]
        )
        combine = moe_combine_weights(logits, top_k)
        y = moe_ffn_dense(
            x,
            combine.astype(x.dtype),
            params["experts_w1"][s],
            params["experts_b1"][s],
            params["experts_w2"][s],
            params["experts_b2"][s],
        )
        return x + y

    def run_mb(x):
        for s in range(pp):
            x = block(x, s)
        return x

    return jax.vmap(run_mb)(microbatches)
