"""Composed data x sequence parallelism for the long-context DT train step.

Ring attention (parallel/ring_attention.py) was previously only validated
alone; this module composes the ``seq`` axis with ``data`` in ONE shard_map
program running the FULL decision-transformer training step — the only
workload in the repo that actually needs sequence sharding (S >= 1024
long-context DT, RESULTS.md long-context rows):

- ``data`` — batch dim sharded; each data shard computes its examples'
  loss terms; gradients psum over ``data``.
- ``seq``  — the K context timesteps shard contiguously, so each device
  holds a contiguous 3*(K/n) window of the interleaved (R, s, a) token
  sequence.  Attention is the ppermute ring (K/V chunks rotate, flash-style
  streaming softmax, global causal positions from ``axis_index``); every
  other block op (LN, FFN, embeddings, heads) is pointwise over tokens and
  runs unchanged on the local chunk.  Loss terms psum over ``seq`` too.

The model itself dispatches at trace time on ``DTConfig.seq_axis``
(models/decision_transformer.py CausalSelfAttention) — the param tree is
identical to the dense model's, so a dense-trained checkpoint drops
straight into the sequence-sharded step and vice versa.

Exactness contract (tests/test_seq_composed.py + the driver dryrun's
data x seq phase): in f32 with dropout off, loss and updated params equal
the single-device dense-oracle step up to reduction order.

The reference has no sequence-parallel counterpart (single-GPU torch
attention, src/models.py); design follows the scaling-book recipe: one
mesh, shard the sequence, let the ring collective ride ICI.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from mmtrl_tpu.models.decision_transformer import DecisionTransformer, DTConfig

DATA_AXIS = "data"
SEQ_AXIS = "seq"


def make_dt_seq_train_step(model_cfg: DTConfig, mesh: Mesh):
    """Train step over a (data, seq) mesh: batch spec P('data') on the
    leading dim, P('seq') on the K dim; params replicated.

    ``model_cfg`` must carry ``seq_axis=SEQ_AXIS`` and
    ``seq_axis_size=mesh.shape['seq']`` so the model's attention runs the
    ring.  Returns ``step(state, batch, dropout_key)`` with the same
    signature and TrainState layout as algos/dt.make_dt_train_step.
    """
    assert model_cfg.seq_axis == SEQ_AXIS, "cfg.seq_axis must name the mesh axis"
    assert model_cfg.seq_axis_size == mesh.shape[SEQ_AXIS], (
        f"cfg.seq_axis_size={model_cfg.seq_axis_size} != mesh "
        f"seq={mesh.shape[SEQ_AXIS]}"
    )
    model = DecisionTransformer(model_cfg)
    n_seq = mesh.shape[SEQ_AXIS]

    def local_step(state, batch, dropout_key):
        rtg, states, actions, timesteps, mask = batch
        # Distinct dropout streams per shard (each device holds different
        # tokens/examples); replicated keys would repeat masks across the
        # sequence ring.
        dropout_key = jax.random.fold_in(
            dropout_key,
            jax.lax.axis_index(DATA_AXIS) * n_seq + jax.lax.axis_index(SEQ_AXIS),
        )

        def loss_fn(params):
            logits = model.apply(
                params, rtg, states, actions, timesteps,
                deterministic=model_cfg.dropout == 0.0,
                rngs={"dropout": dropout_key},
            )
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(
                logp, actions[..., None].astype(jnp.int32), axis=-1
            )[..., 0]
            m = mask.astype(jnp.float32)
            # Global masked mean: both numerator and denominator psum over
            # BOTH axes, so every device sees the same global loss value.
            num = jax.lax.psum((nll * m).sum(), (DATA_AXIS, SEQ_AXIS))
            den = jax.lax.psum(m.sum(), (DATA_AXIS, SEQ_AXIS))
            loss = num / jnp.maximum(den, 1.0)
            hits = jax.lax.psum(
                ((jnp.argmax(logits, -1) == actions) * m).sum(),
                (DATA_AXIS, SEQ_AXIS),
            )
            return loss, hits / jnp.maximum(den, 1.0)

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        # psum's backward delivers only the LOCAL terms' contribution to
        # each replicated param copy; sum them for the true global grad.
        grads = jax.lax.psum(grads, (DATA_AXIS, SEQ_AXIS))
        state = state.apply_gradients(grads=grads)
        return state, {"dt/loss": loss, "dt/action_accuracy": acc}

    # (B, K, ...) batch leaves: B over data, K over seq.
    batch_spec = P(DATA_AXIS, SEQ_AXIS)
    return jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), batch_spec, P()),
        out_specs=(P(), P()),
        check_vma=False,
    )


def seq_cfg(cfg: DTConfig, n_seq: int) -> DTConfig:
    """The same model, attention switched to the ring over ``n_seq`` chips."""
    return dataclasses.replace(cfg, seq_axis=SEQ_AXIS, seq_axis_size=n_seq)


def shard_dt_batch(
    batch: Tuple[jnp.ndarray, ...], mesh: Mesh
) -> Tuple[jnp.ndarray, ...]:
    """Place a (rtg, states, actions, timesteps, mask) batch with B over
    ``data`` and K over ``seq`` (XLA would insert the same layout moves
    lazily; placing up front keeps the step's cost profile honest)."""
    from jax.sharding import NamedSharding

    def put(x):
        spec = P(DATA_AXIS, SEQ_AXIS, *([None] * (x.ndim - 2)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)
