"""Sharding tests on the virtual 8-device CPU mesh: data-parallel PPO,
tensor-parallel decision transformer, mesh utilities — the multi-device
story the reference covers with 2-process torchrun+gloo
(tests/test_atari_multigpu.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from mmtrl_tpu.parallel import make_mesh, data_sharding, shard_batch
from mmtrl_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def test_mesh_construction():
    mesh = make_mesh()
    assert mesh.devices.size == jax.device_count() == 8
    mesh2 = make_mesh((4, 2), (DATA_AXIS, MODEL_AXIS))
    assert mesh2.shape == {DATA_AXIS: 4, MODEL_AXIS: 2}
    with pytest.raises(ValueError):
        make_mesh((3, 2), (DATA_AXIS, MODEL_AXIS))


def test_shard_batch_places_on_data_axis():
    mesh = make_mesh()
    x = jnp.arange(32.0).reshape(8, 4)
    sharded = shard_batch(mesh, {"x": x})["x"]
    assert sharded.sharding == data_sharding(mesh, ndim=2)
    np.testing.assert_array_equal(np.asarray(sharded), np.asarray(x))


def test_data_parallel_ppo_iteration():
    """PPO with the env batch sharded over 8 devices: same jitted program as
    single-device, XLA inserts the gradient all-reduce."""
    from mmtrl_tpu.algos.ppo import PPOConfig, make_ppo
    from mmtrl_tpu.envs import make
    from mmtrl_tpu.models import MLPActorCritic

    env = make("CartPole-v1")
    cfg = PPOConfig(
        total_timesteps=512, num_envs=8, num_steps=16, num_minibatches=2,
        update_epochs=1,
    )
    model = MLPActorCritic(num_actions=env.num_actions)
    init_runner, train_iteration = make_ppo(env, model, cfg)
    mesh = make_mesh()
    runner = init_runner(jax.random.PRNGKey(0))
    # Shard the per-env leaves over the data axis, replicate params.
    dp = NamedSharding(mesh, P(DATA_AXIS))
    repl = NamedSharding(mesh, P())

    def shard_leaf(x):
        x = jnp.asarray(x)
        if x.ndim >= 1 and x.shape[0] == cfg.num_envs:
            return jax.device_put(
                x, NamedSharding(mesh, P(DATA_AXIS, *([None] * (x.ndim - 1))))
            )
        return jax.device_put(x, repl)

    runner = runner.replace(
        env_state=jax.tree_util.tree_map(shard_leaf, runner.env_state),
        obs=shard_leaf(runner.obs),
        done=shard_leaf(runner.done),
        stats=jax.tree_util.tree_map(shard_leaf, runner.stats),
    )
    step = jax.jit(train_iteration)
    with mesh:
        runner, metrics = step(runner)
        runner, metrics = step(runner)
    assert np.isfinite(float(metrics["losses/policy_loss"]))
    # Param replicas must stay identical across devices (all-reduced grads).
    leaf = jax.tree_util.tree_leaves(runner.train_state.params)[0]
    assert np.isfinite(np.asarray(leaf)).all()


def test_tensor_parallel_dt_matches_replicated():
    """TP-sharded DT forward must equal the replicated forward."""
    from mmtrl_tpu.models.decision_transformer import DecisionTransformer, DTConfig
    from mmtrl_tpu.parallel.sharding import dt_param_sharding

    cfg = DTConfig(
        num_actions=4, context_len=4, d_model=64, n_layers=2, n_heads=2,
        dropout=0.0, max_timestep=16, state_kind="vector", state_dim=8,
        compute_dtype="float32",
    )
    model = DecisionTransformer(cfg)
    key = jax.random.PRNGKey(0)
    B, K = 4, 4
    rtg = jax.random.uniform(key, (B, K))
    states = jax.random.normal(key, (B, K, 8))
    actions = jnp.zeros((B, K), jnp.int32)
    ts = jnp.tile(jnp.arange(K), (B, 1))
    params = model.init(key, rtg, states, actions, ts)
    out_ref = model.apply(params, rtg, states, actions, ts)

    mesh = make_mesh((4, 2), (DATA_AXIS, MODEL_AXIS))
    sharded_params = jax.tree_util.tree_map(
        jax.device_put, params, dt_param_sharding(mesh, params)
    )
    with mesh:
        out_tp = jax.jit(model.apply)(sharded_params, rtg, states, actions, ts)
    np.testing.assert_allclose(
        np.asarray(out_ref), np.asarray(out_tp), atol=2e-5, rtol=2e-5
    )


def test_fsdp_dt_matches_replicated():
    """FSDP-sharded (ZeRO-3) DT training step must equal the replicated one:
    params shard over the data axis, XLA inserts per-layer all-gathers and
    gradient reduce-scatters."""
    from mmtrl_tpu.algos.dt import DTTrainConfig, create_dt_state, make_dt_train_step
    from mmtrl_tpu.models.decision_transformer import DTConfig
    from mmtrl_tpu.parallel.sharding import fsdp_param_sharding

    cfg = DTConfig(
        num_actions=4, context_len=4, d_model=64, n_layers=2, n_heads=2,
        dropout=0.0, max_timestep=16, state_kind="vector", state_dim=8,
        compute_dtype="float32",
    )
    key = jax.random.PRNGKey(0)
    B, K = 8, 4
    rtg = jax.random.uniform(key, (B, K))
    states = jax.random.normal(key, (B, K, 8))
    actions = jnp.zeros((B, K), jnp.int32)
    ts = jnp.tile(jnp.arange(K), (B, 1))
    mask = jnp.ones((B, K), bool)
    batch = (rtg, states, actions, ts, mask)
    state = create_dt_state(key, cfg, DTTrainConfig(batch_size=B), batch)
    step = make_dt_train_step(cfg)

    s_ref, m_ref = jax.jit(step)(state, batch, key)

    mesh = make_mesh(axis_names=(DATA_AXIS,))
    # min_size=1: at test sizes every shardable tensor shards, which is the
    # interesting path.
    shardings = fsdp_param_sharding(mesh, state.params, min_size=1)
    sharded_params = jax.tree_util.tree_map(
        jax.device_put, state.params, shardings
    )
    # At least one leaf must actually shard over 'data'.
    specs = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda s: str(s.spec), shardings)
    )
    assert any("data" in s for s in specs), specs
    state_f = state.replace(params=sharded_params)
    batch_f = shard_batch(mesh, batch)
    with mesh:
        s_fsdp, m_fsdp = jax.jit(step)(state_f, batch_f, key)
    np.testing.assert_allclose(
        float(m_ref["dt/loss"]), float(m_fsdp["dt/loss"]), atol=2e-5, rtol=2e-5
    )
    # Updated params stay numerically identical to the replicated run.
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), s_ref.params, s_fsdp.params
    )
    assert max(jax.tree_util.tree_leaves(diffs)) < 5e-5
