"""Composed parallelism: data x pipe x expert in one program.

The per-axis tests (test_parallel.py, test_pipeline_ring.py, test_moe.py)
validate each mesh axis alone; these validate the COMPOSITION — the
three-axis shard_map of parallel/composed.py — against a single-device
dense oracle (value + grads), and that the composed program actually
trains (monotone loss on a fixed regression task).
"""

import jax
import jax.numpy as jnp
import pytest

from mmtrl_tpu.parallel.composed import (
    composed_moe_pipeline_apply,
    dense_moe_pipeline_reference,
    init_moe_stack_params,
)
from mmtrl_tpu.parallel.mesh import make_mesh


def _setup(pp=2, E=4, D=16, F=32, M=4, mb=2, S=6, seed=0):
    key = jax.random.PRNGKey(seed)
    kp, kx = jax.random.split(key)
    params = init_moe_stack_params(kp, pp, E, D, F)
    x = jax.random.normal(kx, (M, mb, S, D), jnp.float32)
    mesh = make_mesh((2, pp, 2), ("data", "pipe", "expert"))
    return params, x, mesh


def _max_abs_diff(a, b):
    return max(
        float(jnp.abs(u - v).max())
        for u, v in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
    )


def test_composed_matches_dense_value_and_grad():
    params, x, mesh = _setup()

    def loss_composed(p):
        return (composed_moe_pipeline_apply(p, x, mesh, top_k=2) ** 2).mean()

    def loss_dense(p):
        return (dense_moe_pipeline_reference(p, x, top_k=2) ** 2).mean()

    vc, gc = jax.jit(jax.value_and_grad(loss_composed))(params)
    vd, gd = jax.value_and_grad(loss_dense)(params)
    assert abs(float(vc) - float(vd)) < 1e-5, (vc, vd)
    err = _max_abs_diff(gc, gd)
    assert err < 2e-5, f"composed grads diverge from dense oracle: {err}"


def test_composed_value_topk1_and_uneven_microbatches():
    # top_k=1 (Switch routing) and M not equal to a multiple of stages:
    # exercises the GPipe tail-masking under the data split (M=6 over dp=2
    # -> 3 local microbatches vs 2 pipeline stages).
    params, _, mesh = _setup()
    x = jax.random.normal(jax.random.PRNGKey(3), (6, 2, 6, 16), jnp.float32)
    out = jax.jit(
        lambda p: composed_moe_pipeline_apply(p, x, mesh, top_k=1)
    )(params)
    ref = dense_moe_pipeline_reference(params, x, top_k=1)
    assert float(jnp.abs(out - ref).max()) < 1e-5


def test_composed_program_trains():
    # 50 SGD steps of regression on a fixed batch through the full
    # three-axis program: the loss must fall monotonically (tiny tolerance
    # for f32 reduction jitter) and substantially.
    params, x, mesh = _setup(seed=1)
    target = jax.random.normal(jax.random.PRNGKey(7), x.shape, jnp.float32)

    def loss_fn(p):
        out = composed_moe_pipeline_apply(p, x, mesh, top_k=2)
        return ((out - target) ** 2).mean()

    @jax.jit
    def step(p):
        l, g = jax.value_and_grad(loss_fn)(p)
        p = jax.tree_util.tree_map(lambda w, gw: w - 0.02 * gw, p, g)
        return p, l

    losses = []
    for _ in range(50):
        params, l = step(params)
        losses.append(float(l))
    drops = sum(b < a + 1e-7 for a, b in zip(losses, losses[1:]))
    assert drops == len(losses) - 1, f"non-monotone: {losses}"
    assert losses[-1] < 0.5 * losses[0], f"barely trained: {losses[0]} -> {losses[-1]}"


@pytest.mark.slow
def test_dp_tp_dt_convergence_50_steps():
    # The flagship DT train step on a (4 data x 2 model) mesh, 50 steps on
    # a fixed batch: loss strictly decreasing end-to-end through the
    # Megatron TP shardings + fused optimizer (verdict round-3 item 6's
    # convergence leg).
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mmtrl_tpu.algos.dt import DTTrainConfig, create_dt_state, make_dt_train_step
    from mmtrl_tpu.models.decision_transformer import DTConfig
    from mmtrl_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
    from mmtrl_tpu.parallel.sharding import dt_param_sharding

    mesh = make_mesh((4, 2), (DATA_AXIS, MODEL_AXIS))
    B, K = 8, 4
    cfg = DTConfig(
        num_actions=4, context_len=K, d_model=32, n_layers=2, n_heads=2,
        dropout=0.0, max_timestep=16, compute_dtype="float32",
    )
    tcfg = DTTrainConfig(batch_size=B, total_steps=60, warmup_steps=1)
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    states = jax.random.uniform(k1, (B, K, 2, 84, 84), jnp.bfloat16, -1.0, 1.0)
    rtg = jax.random.uniform(k2, (B, K), jnp.float32, -30.0, 10.0)
    actions = jax.random.randint(k3, (B, K), 0, 4, dtype=jnp.int32)
    timesteps = jnp.tile(jnp.arange(K, dtype=jnp.int32), (B, 1))
    mask = jnp.ones((B, K), dtype=bool)
    batch = (rtg, states, actions, timesteps, mask)

    state = create_dt_state(key, cfg, tcfg, batch)
    state = state.replace(
        params=jax.device_put(state.params, dt_param_sharding(mesh, state.params))
    )
    shard_b = lambda x: jax.device_put(  # noqa: E731
        x, NamedSharding(mesh, P(DATA_AXIS, *([None] * (x.ndim - 1))))
    )
    batch = jax.tree_util.tree_map(shard_b, batch)
    train_step = jax.jit(make_dt_train_step(cfg))

    losses = []
    with mesh:
        for i in range(50):
            state, metrics = train_step(state, batch, jax.random.PRNGKey(i))
            losses.append(float(metrics["dt/loss"]))
    drops = sum(b < a for a, b in zip(losses, losses[1:]))
    assert losses[-1] < losses[0] * 0.7, f"{losses[0]} -> {losses[-1]}"
    assert drops >= 45, f"only {drops}/49 steps decreased: {losses}"
