"""Hardware test: the flagship DT training step in bf16 on a real chip.

Run manually (tests/ CPU conftest does not apply here):
    python -m pytest tests_tpu/test_dt_step_tpu.py -q
"""

import jax
import jax.numpy as jnp
import numpy as np


def test_dt_train_step_bf16_finite_and_learns():
    from mmtrl_tpu.algos.dt import (
        DTTrainConfig, create_dt_state, make_dt_train_step,
    )
    from mmtrl_tpu.models.decision_transformer import DTConfig

    B, K = 16, 30
    cfg = DTConfig(
        num_actions=4, context_len=K, d_model=256, n_layers=2, n_heads=2,
        dropout=0.1, max_timestep=64,
    )
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    states = jax.random.uniform(
        k1, (B, K, 2, 84, 84), jnp.bfloat16, minval=-1.0, maxval=1.0
    )
    rtg = jax.random.uniform(k2, (B, K), jnp.float32, minval=-30.0, maxval=10.0)
    actions = jax.random.randint(k3, (B, K), 0, 4, dtype=jnp.int32)
    timesteps = jnp.tile(jnp.arange(K, dtype=jnp.int32), (B, 1))
    mask = jnp.ones((B, K), dtype=bool)
    batch = (rtg, states, actions, timesteps, mask)

    state = create_dt_state(key, cfg, DTTrainConfig(batch_size=B), batch)
    step = jax.jit(make_dt_train_step(cfg), donate_argnums=(0,))

    losses = []
    for i in range(8):
        state, m = step(state, batch, jax.random.fold_in(key, i))
        losses.append(float(m["dt/loss"]))  # fetch: real execution barrier
    assert all(np.isfinite(losses)), losses
    # Fixed batch: the loss must drop as the model memorizes it.
    assert losses[-1] < losses[0], losses
