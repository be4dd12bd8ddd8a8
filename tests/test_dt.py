"""Decision-transformer tests: data pipeline golden values, causality,
overfit sanity, on-device evaluation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmtrl_tpu.algos.dt import (
    DTTrainConfig,
    TrajectoryBuffer,
    collect_trajectories,
    create_dt_state,
    evaluate_dt,
    make_dt_train_step,
    returns_to_go,
)
from mmtrl_tpu.envs import make
from mmtrl_tpu.models.decision_transformer import DecisionTransformer, DTConfig

TINY = DTConfig(
    num_actions=4, context_len=6, d_model=32, n_layers=2, n_heads=2,
    dropout=0.0, max_timestep=64, compute_dtype="float32",
)


def tiny_batch(key, B=4, K=6):
    k1, k2, k3 = jax.random.split(key, 3)
    return (
        jax.random.uniform(k1, (B, K)),
        jax.random.uniform(k2, (B, K, 2, 84, 84), minval=-1, maxval=1),
        jax.random.randint(k3, (B, K), 0, 4),
        jnp.tile(jnp.arange(K), (B, 1)),
        jnp.ones((B, K), bool),
    )


def test_returns_to_go_golden():
    rewards = jnp.array([[1.0], [2.0], [3.0], [4.0], [5.0]])
    dones = jnp.array([[0.0], [0.0], [1.0], [0.0], [0.0]])
    rtg = returns_to_go(rewards, dones)
    # Episode 1: steps 0-2 -> rtg 6,5,3; episode 2: steps 3-4 -> rtg 9,5
    np.testing.assert_allclose(np.asarray(rtg)[:, 0], [6, 5, 3, 9, 5])


def test_trajectory_buffer_sampling_masks_episode_boundary():
    T, N, K = 10, 1, 4
    # Episode of 6 steps then one of 4; timesteps restart at step 6.
    # Storage is stream-major (N, T).
    timesteps = jnp.array([[0, 1, 2, 3, 4, 5, 0, 1, 2, 3]])
    buf = TrajectoryBuffer(
        states=jnp.arange(T, dtype=jnp.float32).reshape(N, T, 1),
        actions=jnp.zeros((N, T), jnp.int32),
        rtg=jnp.zeros((N, T)),
        timesteps=timesteps.astype(jnp.int32),
        episode_starts=(timesteps == 0),
    )
    # Deterministically probe all window endings.
    for t_end in range(K - 1, T):
        offsets = jnp.arange(K) - (K - 1)
        t_idx = t_end + offsets
        ts = buf.timesteps[0, t_idx]
        expected = ts[-1] + offsets
        mask = (expected >= 0) & (ts == expected)
        # Positions crossing into the previous episode must be masked.
        for i, t in enumerate(np.asarray(t_idx)):
            crosses = t < 6 and t_end >= 6
            assert bool(mask[i]) == (not crosses)


def test_collect_trajectories_shapes():
    env = make("minecraft")
    buf = jax.jit(lambda k: collect_trajectories(env, k, 32, 2))(
        jax.random.PRNGKey(0)
    )
    # states stored flat and STREAM-MAJOR (N, T, F) so windows are contiguous
    # slabs; sample() restores (B, K, *state_shape)
    assert buf.states.shape == (2, 32, 2 * 84 * 84)
    assert buf.state_shape == (2, 84, 84)
    rtg, states, actions, ts, mask = buf.sample(jax.random.PRNGKey(1), 4, 5)
    assert states.shape == (4, 5, 2, 84, 84)
    assert buf.actions.shape == buf.rtg.shape == buf.timesteps.shape == (2, 32)
    # rtg is consistent: at episode starts, rtg equals the sum of rewards of
    # that episode — at minimum, rtg is finite and bounded by reward scale.
    assert np.isfinite(np.asarray(buf.rtg)).all()
    assert np.abs(np.asarray(buf.rtg)).max() <= 40.0  # 30 steps * |-1| + 10


def test_dt_forward_shape_and_causality():
    model = DecisionTransformer(TINY)
    key = jax.random.PRNGKey(0)
    batch = tiny_batch(key)
    rtg, states, actions, ts, _ = batch
    params = model.init(key, rtg, states, actions, ts)
    logits = model.apply(params, rtg, states, actions, ts)
    assert logits.shape == (4, 6, 4)

    # Causality: perturbing timestep t=4's state must not change action
    # predictions at timesteps < 4.
    states2 = states.at[:, 4].add(0.5)
    logits2 = model.apply(params, rtg, states2, actions, ts)
    np.testing.assert_allclose(
        np.asarray(logits[:, :4]), np.asarray(logits2[:, :4]), atol=1e-5
    )
    assert not np.allclose(np.asarray(logits[:, 4:]), np.asarray(logits2[:, 4:]))

    # The action at position t must not see action_t itself (predicted from
    # the state token, which precedes the action token).
    actions2 = actions.at[:, 3].set((actions[:, 3] + 1) % 4)
    logits3 = model.apply(params, rtg, states, actions2, ts)
    np.testing.assert_allclose(
        np.asarray(logits[:, 3]), np.asarray(logits3[:, 3]), atol=1e-5
    )


def test_dt_remat_matches_no_remat():
    """cfg.remat=True (jax.checkpoint on the blocks) is numerically the
    same program — identical param tree, forward, loss, and grads — just
    with activations rematerialized in the backward."""
    import dataclasses

    cfg_r = dataclasses.replace(TINY, remat=True)
    key = jax.random.PRNGKey(2)
    rtg, states, actions, ts, _ = tiny_batch(key)
    model = DecisionTransformer(TINY)
    model_r = DecisionTransformer(cfg_r)
    params = model.init(key, rtg, states, actions, ts)
    # Same parameter structure => checkpoints are interchangeable.
    assert jax.tree_util.tree_structure(
        params
    ) == jax.tree_util.tree_structure(model_r.init(key, rtg, states, actions, ts))

    def loss(m):
        def f(p):
            lg = m.apply(p, rtg, states, actions, ts)
            return (
                -jax.nn.log_softmax(lg)
                * jax.nn.one_hot(actions, TINY.num_actions)
            ).sum()

        return f

    l0, g0 = jax.value_and_grad(loss(model))(params)
    l1, g1 = jax.value_and_grad(loss(model_r))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5
        ),
        g0,
        g1,
    )


def test_dt_overfits_tiny_batch():
    key = jax.random.PRNGKey(0)
    batch = tiny_batch(key)
    state = create_dt_state(
        key, TINY, DTTrainConfig(total_steps=60, warmup_steps=5, learning_rate=1e-3),
        batch,
    )
    step = jax.jit(make_dt_train_step(TINY))
    first = None
    for i in range(40):
        state, m = step(state, batch, jax.random.PRNGKey(i))
        if first is None:
            first = float(m["dt/loss"])
    final = float(m["dt/loss"])
    assert final < first * 0.5, (first, final)


def test_evaluate_dt_runs():
    env = make("minecraft")
    key = jax.random.PRNGKey(0)
    batch = tiny_batch(key, B=2, K=TINY.context_len)
    model = DecisionTransformer(TINY)
    rtg, states, actions, ts, _ = batch
    params = model.init(key, rtg, states, actions, ts)
    out = jax.jit(
        lambda k: evaluate_dt(env, TINY, params, k, 10.0, num_envs=2, num_steps=8)
    )(key)
    assert np.isfinite(float(out["eval/episodic_return"]))
