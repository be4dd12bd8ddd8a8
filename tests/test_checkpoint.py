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
