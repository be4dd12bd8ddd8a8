"""Checkpoint-resume continues the update counter (VERDICT round 1, weak #4).

The reference restores ``initial_update`` from its pickle
(src/utils.py:40-44, train.py:120-123); here it is derived from the
restored optimizer step count.  A resumed run must (a) not restart at
update 1, (b) continue the LR anneal from where it stopped, and (c) run
only the remaining updates.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


def test_ppo_resume_continues_update_counter(tmp_path, capsys):
    import ppo as ppo_script

    save_dir = str(tmp_path / "ckpt")
    common = dict(
        env_id="CartPole-v1",
        num_envs=2,
        num_steps=16,
        num_minibatches=2,
        update_epochs=2,
        print_interval=100,
        save_dir=save_dir,
        seed=7,
    )
    # Phase 1: 8 of 16 updates, checkpointing at the end.
    args1 = ppo_script.Args(
        total_timesteps=8 * 32, save_interval=8, exp_name="resume_a", **common
    )
    out1 = ppo_script.main(args1)
    ckpt = os.path.join(save_dir, out1["run_name"])
    assert os.path.exists(ckpt)

    # Phase 2: resume with double the budget -> must start at update 9.
    args2 = ppo_script.Args(
        total_timesteps=16 * 32, save_interval=0, exp_name="resume_b",
        load_from=ckpt, **common
    )
    out2 = ppo_script.main(args2)
    printed = capsys.readouterr().out
    assert "resuming at update 9" in printed
    # Only the remaining 8 updates' steps are added on top of the restored
    # global_step baseline (8*32), ending at the full budget.
    assert out2["global_step"] == 16 * 32


def test_offpolicy_resume_continues_iteration(tmp_path, capsys):
    import dqn as dqn_script

    save_dir = str(tmp_path / "ckpt")
    common = dict(
        env_id="CartPole-v1",
        buffer_size=512,
        learning_starts=64,
        steps_per_iteration=128,
        print_interval=100,
        save_dir=save_dir,
        seed=3,
    )
    args1 = dqn_script.Args(
        total_timesteps=512, save_interval=4, exp_name="resume_a", **common
    )
    out1 = dqn_script.main(args1)
    ckpt = os.path.join(save_dir, out1["run_name"])
    assert os.path.exists(ckpt)

    args2 = dqn_script.Args(
        total_timesteps=1024, save_interval=0, exp_name="resume_b",
        load_from=ckpt, **common
    )
    out2 = dqn_script.main(args2)
    printed = capsys.readouterr().out
    assert "resuming at iteration 5" in printed
    assert out2["global_step"] == 1024


def test_target_kl_freezes_updates_after_trigger():
    """target_kl=0 must keep exactly the first epoch's update and freeze the
    train state for every later epoch (VERDICT round 1, weak #5)."""
    import jax
    import jax.numpy as jnp

    from mmtrl_tpu.algos.ppo.core import PPOConfig, make_ppo
    from mmtrl_tpu.envs import make
    from mmtrl_tpu.models import MLPActorCritic

    env = make("CartPole-v1")

    def train_params(target_kl, update_epochs):
        cfg = PPOConfig(
            total_timesteps=64, num_envs=2, num_steps=16, num_minibatches=2,
            update_epochs=update_epochs, target_kl=target_kl, anneal_lr=False,
        )
        model = MLPActorCritic(num_actions=env.num_actions)
        init_runner, train_iteration = make_ppo(env, model, cfg)
        runner = init_runner(jax.random.PRNGKey(0))
        runner, _ = jax.jit(train_iteration)(runner)
        return runner.train_state

    # target_kl=0 trips after epoch 1 -> 4-epoch run must equal a 1-epoch run.
    frozen = train_params(0.0, 4)
    one_epoch = train_params(None, 1)
    assert int(frozen.step) == int(one_epoch.step) == 2  # 2 minibatches
    for a, b in zip(
        jax.tree_util.tree_leaves(frozen.params),
        jax.tree_util.tree_leaves(one_epoch.params),
    ):
        assert jnp.allclose(a, b), "post-trigger epochs must not change params"
