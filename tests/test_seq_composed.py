"""Composed data x seq parallelism: the full DT train step under a
(data, seq) mesh with ring attention equals the single-device dense step.

Round-5 verdict item 5: sequence parallelism was the one axis never
composed; the long-context DT is the workload that needs it.  Exactness is
checked on the COMPLETE training step (loss, metrics, and every updated
parameter) — not just the attention op — so the loss psums, the gradient
psum over both axes, and the fused clip-AdamW update are all covered.
"""

import dataclasses

import jax
import jax.numpy as jnp
import pytest

from mmtrl_tpu.algos.dt import DTTrainConfig, create_dt_state, make_dt_train_step
from mmtrl_tpu.models.decision_transformer import DTConfig
from mmtrl_tpu.parallel.mesh import make_mesh
from mmtrl_tpu.parallel.seq_composed import (
    make_dt_seq_train_step,
    seq_cfg,
    shard_dt_batch,
)


def _vector_batch(key, B, K, state_dim, num_actions):
    k1, k2, k3 = jax.random.split(key, 3)
    states = jax.random.normal(k1, (B, K, state_dim), jnp.float32)
    rtg = jax.random.uniform(k2, (B, K), jnp.float32, minval=-5.0, maxval=5.0)
    actions = jax.random.randint(k3, (B, K), 0, num_actions, dtype=jnp.int32)
    timesteps = jnp.tile(jnp.arange(K, dtype=jnp.int32), (B, 1))
    mask = jnp.ones((B, K), dtype=bool)
    # Mask a ragged tail on one example so the masked-mean psums are
    # exercised with a non-trivial denominator.
    mask = mask.at[0, -2:].set(False)
    return rtg, states, actions, timesteps, mask


def _dense_cfg(K):
    return DTConfig(
        num_actions=4, context_len=K, d_model=32, n_layers=2, n_heads=2,
        dropout=0.0, max_timestep=64, state_kind="vector", state_dim=8,
        compute_dtype="float32",
    )


@pytest.mark.parametrize("dp,sp", [(2, 4), (4, 2)])
def test_seq_composed_step_matches_dense(dp, sp):
    K, B = 8, 2 * dp
    cfg = _dense_cfg(K)
    tcfg = DTTrainConfig(batch_size=B, total_steps=10, warmup_steps=2)
    key = jax.random.PRNGKey(0)
    batch = _vector_batch(key, B, K, cfg.state_dim, cfg.num_actions)
    state = create_dt_state(key, cfg, tcfg, batch)

    dense_step = jax.jit(make_dt_train_step(cfg))
    dense_state, dense_m = dense_step(state, batch, jax.random.PRNGKey(1))

    mesh = make_mesh((dp, sp), ("data", "seq"), devices=jax.devices()[: dp * sp])
    seq_step = jax.jit(make_dt_seq_train_step(seq_cfg(cfg, sp), mesh))
    sbatch = shard_dt_batch(batch, mesh)
    with mesh:
        seq_state, seq_m = seq_step(state, sbatch, jax.random.PRNGKey(1))

    assert abs(float(dense_m["dt/loss"]) - float(seq_m["dt/loss"])) < 1e-5
    assert (
        abs(
            float(dense_m["dt/action_accuracy"])
            - float(seq_m["dt/action_accuracy"])
        )
        < 1e-6
    )
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(dense_state.params),
        jax.tree_util.tree_leaves_with_path(seq_state.params),
    ):
        assert pa == pb
        err = float(jnp.abs(a - b).max())
        assert err < 2e-5, f"{jax.tree_util.keystr(pa)}: {err}"


def test_seq_composed_converges_and_checkpoint_compatible():
    """Multi-step: the sequence-sharded step trains (loss drops) and its
    param tree round-trips with the dense model (same treedef/shapes)."""
    dp, sp = 2, 4
    K, B = 8, 4
    cfg = _dense_cfg(K)
    tcfg = DTTrainConfig(
        batch_size=B, total_steps=30, warmup_steps=2, learning_rate=3e-3
    )
    key = jax.random.PRNGKey(2)
    batch = _vector_batch(key, B, K, cfg.state_dim, cfg.num_actions)
    state = create_dt_state(key, cfg, tcfg, batch)
    dense_tree = jax.tree_util.tree_structure(state.params)

    mesh = make_mesh((dp, sp), ("data", "seq"), devices=jax.devices()[:8])
    step = jax.jit(make_dt_seq_train_step(seq_cfg(cfg, sp), mesh))
    sbatch = shard_dt_batch(batch, mesh)
    losses = []
    with mesh:
        for i in range(25):
            state, m = step(state, sbatch, jax.random.PRNGKey(10 + i))
            losses.append(float(m["dt/loss"]))
    assert losses[-1] < losses[0] * 0.7, losses
    assert jax.tree_util.tree_structure(state.params) == dense_tree


def test_seq_cfg_rejects_mismatched_axis_size():
    mesh = make_mesh((2, 4), ("data", "seq"), devices=jax.devices()[:8])
    cfg = dataclasses.replace(_dense_cfg(8), seq_axis="seq", seq_axis_size=2)
    with pytest.raises(AssertionError):
        make_dt_seq_train_step(cfg, mesh)
