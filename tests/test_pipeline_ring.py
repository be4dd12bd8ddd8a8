"""Pipeline parallelism (parallel/pipeline.py) and sequence-parallel ring
attention (parallel/ring_attention.py) on the virtual 8-device CPU mesh.

Both are exactness tests: the distributed schedules must reproduce the
single-device computation bit-for-bit up to float32 reduction order."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmtrl_tpu.parallel.mesh import make_mesh
from mmtrl_tpu.parallel.pipeline import pipeline_apply, stack_stage_params
from mmtrl_tpu.parallel.ring_attention import ring_attention


def _dense_attention(q, k, v, causal, scale=None):
    D = q.shape[-1]
    s = scale if scale is not None else 1.0 / (D**0.5)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q * s, k)
    if causal:
        S = q.shape[2]
        mask = jnp.tril(jnp.ones((S, S), bool))
        scores = jnp.where(mask[None, None], scores, -1e30)
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_matches_dense(causal):
    mesh = make_mesh((8,), ("seq",))
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    B, H, S, D = 2, 2, 32, 8
    q = jax.random.normal(kq, (B, H, S, D), jnp.float32)
    k = jax.random.normal(kk, (B, H, S, D), jnp.float32)
    v = jax.random.normal(kv, (B, H, S, D), jnp.float32)

    out = jax.jit(
        lambda q, k, v: ring_attention(q, k, v, mesh, causal=causal)
    )(q, k, v)
    ref = _dense_attention(q, k, v, causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_attention_grads_match_dense():
    mesh = make_mesh((4,), ("seq",), devices=jax.devices()[:4])
    key = jax.random.PRNGKey(1)
    kq, kk, kv = jax.random.split(key, 3)
    B, H, S, D = 1, 2, 16, 8
    q = jax.random.normal(kq, (B, H, S, D), jnp.float32)
    k = jax.random.normal(kk, (B, H, S, D), jnp.float32)
    v = jax.random.normal(kv, (B, H, S, D), jnp.float32)
    # A non-uniform readout so every grad entry is exercised.
    w = jax.random.normal(jax.random.PRNGKey(2), (D,), jnp.float32)

    def loss_ring(q, k, v):
        return (ring_attention(q, k, v, mesh, causal=True) * w).sum()

    def loss_dense(q, k, v):
        return (_dense_attention(q, k, v, causal=True) * w).sum()

    g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    g_dense = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for gr, gd in zip(g_ring, g_dense):
        np.testing.assert_allclose(np.asarray(gr), np.asarray(gd), atol=3e-5)


def _mlp_stage(params, x):
    h = jnp.tanh(x @ params["w1"] + params["b1"])
    return h @ params["w2"] + params["b2"]


def _make_stage_params(key, d, hidden):
    k1, k2 = jax.random.split(key)
    return {
        "w1": jax.random.normal(k1, (d, hidden), jnp.float32) * 0.3,
        "b1": jnp.zeros((hidden,), jnp.float32),
        "w2": jax.random.normal(k2, (hidden, d), jnp.float32) * 0.3,
        "b2": jnp.zeros((d,), jnp.float32),
    }


def test_pipeline_matches_sequential():
    pp, d, hidden = 4, 6, 12
    mesh = make_mesh((pp,), ("pipe",), devices=jax.devices()[:pp])
    keys = jax.random.split(jax.random.PRNGKey(3), pp)
    stages = [_make_stage_params(k, d, hidden) for k in keys]
    stacked = stack_stage_params(stages)

    M, mb = 6, 3  # 6 microbatches of 3 rows
    x = jax.random.normal(jax.random.PRNGKey(4), (M, mb, d), jnp.float32)

    out = jax.jit(
        lambda p, x: pipeline_apply(_mlp_stage, p, x, mesh)
    )(stacked, x)

    ref = x
    for p in stages:
        ref = _mlp_stage(p, ref.reshape(M * mb, d)).reshape(M, mb, d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pipeline_grads_match_sequential():
    pp, d, hidden = 4, 4, 8
    mesh = make_mesh((pp,), ("pipe",), devices=jax.devices()[:pp])
    keys = jax.random.split(jax.random.PRNGKey(5), pp)
    stages = [_make_stage_params(k, d, hidden) for k in keys]
    stacked = stack_stage_params(stages)
    M, mb = 4, 2
    x = jax.random.normal(jax.random.PRNGKey(6), (M, mb, d), jnp.float32)

    def loss_pp(stacked):
        return (pipeline_apply(_mlp_stage, stacked, x, mesh) ** 2).sum()

    def loss_seq(stacked):
        stages = [
            jax.tree_util.tree_map(lambda a: a[i], stacked) for i in range(pp)
        ]
        y = x
        for p in stages:
            y = _mlp_stage(p, y)
        return (y**2).sum()

    g_pp = jax.jit(jax.grad(loss_pp))(stacked)
    g_seq = jax.grad(loss_seq)(stacked)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-5
        ),
        g_pp,
        g_seq,
    )


def test_pipeline_dt_blocks():
    """The real DecisionTransformer Block stack pipelined over 4 stages
    reproduces the sequential 8-block forward."""
    from mmtrl_tpu.models.decision_transformer import Block, DTConfig

    cfg = DTConfig(
        num_actions=4, context_len=8, d_model=16, n_layers=8, n_heads=2,
        dropout=0.0, max_timestep=16, compute_dtype="float32",
    )
    blk = Block(cfg)
    pp, layers_per_stage = 4, 2
    x0 = jax.random.normal(jax.random.PRNGKey(7), (4, 2, 24, 16), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(8), cfg.n_layers)
    layer_params = [
        blk.init(k, x0[0], True)["params"] for k in keys
    ]

    # Sequential reference.
    y = x0.reshape(8, 24, 16)
    for p in layer_params:
        y = blk.apply({"params": p}, y, True)
    ref = y.reshape(4, 2, 24, 16)

    # Stage = lax.scan over its 2 layers; stages stacked for the pipeline.
    stage_trees = [
        stack_stage_params(layer_params[i * layers_per_stage:(i + 1) * layers_per_stage])
        for i in range(pp)
    ]
    stacked = stack_stage_params(stage_trees)

    def stage_fn(params, x):
        def body(x, p):
            return blk.apply({"params": p}, x, True), None

        x, _ = jax.lax.scan(body, x, params)
        return x

    mesh = make_mesh((pp,), ("pipe",), devices=jax.devices()[:pp])
    out = jax.jit(
        lambda p, x: pipeline_apply(stage_fn, p, x, mesh)
    )(stacked, x0)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-5
    )
