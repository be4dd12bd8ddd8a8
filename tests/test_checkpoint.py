"""Checkpoint round-trip: save a training runner mid-run, restore it, and
verify training continues bit-compatibly — the reference's save/load-run
semantics (src/utils.py:23-44) on the Orbax PyTree store."""

import jax
import jax.numpy as jnp
import numpy as np

from mmtrl_tpu.algos.ppo import PPOConfig, make_ppo
from mmtrl_tpu.core.checkpoint import load_run, save_run
from mmtrl_tpu.envs import make
from mmtrl_tpu.models import MLPActorCritic


def test_save_restore_continue(tmp_path):
    env = make("CartPole-v1")
    cfg = PPOConfig(total_timesteps=2048, num_envs=4, num_steps=32,
                    num_minibatches=2, update_epochs=1)
    model = MLPActorCritic(num_actions=env.num_actions)
    init_runner, train_iteration = make_ppo(env, model, cfg)
    step = jax.jit(train_iteration)

    runner = init_runner(jax.random.PRNGKey(0))
    runner, _ = step(runner)
    runner, _ = step(runner)

    path = save_run(jax.device_get(runner), "ckpt_test", str(tmp_path))
    restored = load_run(path, target=jax.device_get(runner))

    # restored tree must match exactly
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(runner)),
        jax.tree_util.tree_leaves(restored),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # and training must continue identically from both copies
    r1, m1 = step(runner)
    r2, m2 = step(jax.tree_util.tree_map(jnp.asarray, restored))
    np.testing.assert_allclose(
        float(m1["losses/policy_loss"]), float(m2["losses/policy_loss"]),
        rtol=1e-5,
    )


def test_restore_across_topologies(tmp_path):
    """The checkpoint module's headline claim — "restartable on any device
    topology" — exercised: a DT train state saved from a single-device run
    restores onto the 8-device virtual mesh, re-sharded FSDP over the data
    axis, and the next sharded training step matches the single-device
    continuation bit-for-bit (within collective reduction tolerance)."""
    from mmtrl_tpu.algos.dt import (
        DTTrainConfig,
        create_dt_state,
        make_dt_train_step,
    )
    from mmtrl_tpu.models.decision_transformer import DTConfig
    from mmtrl_tpu.parallel import make_mesh, shard_batch
    from mmtrl_tpu.parallel.mesh import DATA_AXIS
    from mmtrl_tpu.parallel.sharding import fsdp_param_sharding

    cfg = DTConfig(
        num_actions=4, context_len=4, d_model=64, n_layers=2, n_heads=2,
        dropout=0.0, max_timestep=16, state_kind="vector", state_dim=8,
        compute_dtype="float32",
    )
    key = jax.random.PRNGKey(0)
    B, K = 8, 4
    batch = (
        jax.random.uniform(key, (B, K)),
        jax.random.normal(key, (B, K, 8)),
        jnp.zeros((B, K), jnp.int32),
        jnp.tile(jnp.arange(K), (B, 1)),
        jnp.ones((B, K), bool),
    )
    state = create_dt_state(key, cfg, DTTrainConfig(batch_size=B), batch)
    step = make_dt_train_step(cfg)
    # Advance one step on the "old topology" (single device), then save.
    state, _ = jax.jit(step)(state, batch, key)
    path = save_run(state, "dt_topo", str(tmp_path))

    # Single-device continuation = ground truth for the next step.
    _, m_ref = jax.jit(step)(state, batch, jax.random.PRNGKey(7))

    # "New topology": restore raw (no target pytree from the old run needed
    # beyond structure), re-shard FSDP over the 8-device mesh, continue.
    restored = load_run(path, target=jax.device_get(state))
    restored = jax.tree_util.tree_map(jnp.asarray, restored)
    mesh = make_mesh(axis_names=(DATA_AXIS,))
    shardings = fsdp_param_sharding(mesh, restored.params, min_size=1)
    sharded = restored.replace(
        params=jax.tree_util.tree_map(
            jax.device_put, restored.params, shardings
        )
    )
    with mesh:
        _, m_new = jax.jit(step)(sharded, shard_batch(mesh, batch), jax.random.PRNGKey(7))
    np.testing.assert_allclose(
        float(m_ref["dt/loss"]), float(m_new["dt/loss"]), atol=2e-5, rtol=2e-5
    )


def test_save_run_interrupted_save_preserves_previous(tmp_path, monkeypatch):
    """A save that dies mid-write must leave the previous checkpoint
    restorable (the two-rename swap in core/checkpoint.py): previously
    force=True deleted the old tree before writing the new one."""
    import orbax.checkpoint as ocp

    from mmtrl_tpu.core.checkpoint import load_run, save_run

    tree = {"w": jnp.arange(4.0), "step": jnp.int32(1)}
    path = save_run(tree, "run_a", str(tmp_path))
    # Second save is killed mid-write: the temp dir gets partial content
    # and the process dies before any rename.
    real_save = ocp.PyTreeCheckpointer.save

    def dying_save(self, p, *a, **k):
        raise RuntimeError("simulated kill mid-save")

    monkeypatch.setattr(ocp.PyTreeCheckpointer, "save", dying_save)
    try:
        save_run({"w": jnp.zeros(4), "step": jnp.int32(2)}, "run_a", str(tmp_path))
    except RuntimeError:
        pass
    monkeypatch.setattr(ocp.PyTreeCheckpointer, "save", real_save)
    restored = load_run(path)
    np.testing.assert_allclose(np.asarray(restored["w"]), np.arange(4.0))

    # A successful re-save replaces content and leaves no transient dirs.
    save_run({"w": jnp.full(4, 7.0), "step": jnp.int32(3)}, "run_a", str(tmp_path))
    restored = load_run(path)
    np.testing.assert_allclose(np.asarray(restored["w"]), np.full(4, 7.0))
    import os as _os

    leftovers = [
        p for p in _os.listdir(tmp_path)
        if p.startswith("_tmp_") or p.startswith("_old_")
    ]
    assert leftovers == [], leftovers
