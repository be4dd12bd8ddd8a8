"""End-to-end smoke tests: every entry script with a tiny budget.

The reference's dominant test style — run each trainer with minuscule
budgets and assert success (reference: tests/test_atari.py:4-10,
tests/test_classic_control.py:4-9).  Runs in-process (CPU backend via
conftest) instead of subprocess so JAX initializes once.
"""

import os
import sys

import pytest

SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts")
sys.path.insert(0, os.path.abspath(SCRIPTS))

COMMON = [
    "--total-timesteps", "256",
    "--num-envs", "2",
    "--num-steps", "32",
    "--num-minibatches", "2",
    "--update-epochs", "1",
    "--print-interval", "10",
]

OFFPOLICY = [
    "--total-timesteps", "512",
    "--learning-starts", "64",
    "--buffer-size", "512",
    "--batch-size", "16",
    "--steps-per-iteration", "256",
    "--print-interval", "10",
]


def run_main(module_name, argv):
    import importlib

    mod = importlib.import_module(module_name)
    return mod.main(mod.cli(mod.Args, argv))


def test_ppo_cartpole():
    out = run_main("ppo", COMMON + ["--env-id", "CartPole-v1"])
    assert out["global_step"] == 256


def test_ppo_acrobot():
    run_main("ppo", COMMON + ["--env-id", "Acrobot-v1"])


def test_minecraft_cnn():
    run_main("minecraft_cnn", COMMON)


@pytest.mark.parametrize("attn", ["casl", "new"])
def test_train_multimodal(attn):
    run_main(
        "train",
        [
            "--attn-type", attn, "--fusion-type", "sum",
            "--total-timesteps", "128", "--num-envs", "2", "--num-steps", "16",
            "--num-minibatches", "1", "--update-epochs", "1",
            "--print-interval", "10",
        ],
    )


def test_minecraft_lstm_attention():
    run_main(
        "minecraft_lstm_attention",
        ["--total-timesteps", "128", "--num-envs", "2", "--num-steps", "16",
         "--num-minibatches", "1", "--print-interval", "10"],
    )


def test_minecraft_lstm_old_agent():
    run_main(
        "minecraft_lstm",
        ["--agent", "old", "--total-timesteps", "128", "--num-envs", "2",
         "--num-steps", "16", "--num-minibatches", "1", "--print-interval", "10"],
    )


def test_ppo_continuous():
    run_main(
        "ppo_continuous_action",
        ["--total-timesteps", "256", "--num-envs", "2", "--num-steps", "64",
         "--num-minibatches", "2", "--update-epochs", "1",
         "--print-interval", "10"],
    )


def test_rpo():
    run_main(
        "rpo_continuous_action",
        ["--total-timesteps", "256", "--num-envs", "2", "--num-steps", "64",
         "--num-minibatches", "2", "--update-epochs", "1", "--rpo-alpha", "0.5",
         "--print-interval", "10"],
    )


def test_dqn():
    run_main("dqn", OFFPOLICY + ["--env-id", "CartPole-v1"])


def test_c51():
    run_main("c51", OFFPOLICY + ["--env-id", "CartPole-v1", "--n-atoms", "51"])


def test_ddpg():
    run_main("ddpg_continuous_action", OFFPOLICY)


def test_td3():
    run_main("td3_continuous_action", OFFPOLICY)


def test_sac():
    run_main("sac_continuous_action", OFFPOLICY)


@pytest.mark.parametrize("algo", ["sac", "td3", "ddpg"])
def test_offpolicy_hostloop(algo):
    """Host-loop mode: host envs + device chunk updates (hostloop.py)."""
    out = run_main(
        f"{algo}_continuous_action",
        OFFPOLICY
        + ["--env-id", "Pendulum-v1", "--host-loop", "--chunk-size", "32"],
    )
    assert out["global_step"] >= 512
    assert "eval_episodic_return" in out


def test_ppg():
    run_main(
        "ppg",
        ["--env-id", "CartPole-v1", "--total-timesteps", "256",
         "--num-envs", "2", "--num-steps", "16", "--n-iteration", "2",
         "--num-minibatches", "2", "--num-aux-minibatches", "2",
         "--e-auxiliary", "1", "--print-interval", "10"],
    )


def test_ppg_procmaze():
    """PPG on the procgen-contract env (IMPALA tower on image obs)."""
    run_main(
        "ppg",
        ["--env-id", "procmaze", "--num-levels", "4", "--total-timesteps",
         "128", "--num-envs", "2", "--num-steps", "16", "--n-iteration", "2",
         "--num-minibatches", "2", "--num-aux-minibatches", "2",
         "--e-auxiliary", "1", "--print-interval", "10"],
    )


def test_ppo_rnd():
    run_main(
        "ppo_rnd",
        ["--env-id", "CartPole-v1", "--total-timesteps", "128",
         "--num-envs", "2", "--num-steps", "32", "--num-minibatches", "2",
         "--update-epochs", "1", "--print-interval", "10"],
    )


def test_dqn_prioritized():
    run_main(
        "dqn",
        OFFPOLICY + ["--env-id", "CartPole-v1", "--prioritized-replay", "True"],
    )


def test_dt_minecraft_pipeline():
    """Full offline pipeline: collect -> stream-major buffer -> train ->
    return-conditioned eval, with a tiny model and budget."""
    import dt_minecraft

    out = dt_minecraft.main(dt_minecraft.cli(dt_minecraft.Args, [
        "--collect-steps", "64", "--collect-envs", "2",
        "--context-len", "4", "--d-model", "32", "--n-layers", "1",
        "--n-heads", "2", "--batch-size", "4", "--total-steps", "6",
        "--warmup-steps", "2", "--eval-envs", "2", "--eval-steps", "8",
        "--print-interval", "3",
    ]))
    assert "eval/episodic_return" in out


def test_dt_minecraft_fused_dispatch():
    """--steps-per-dispatch > 1: scan-fused sample+train (train.py
    make_dt_train_steps) must run the same pipeline."""
    import dt_minecraft

    out = dt_minecraft.main(dt_minecraft.cli(dt_minecraft.Args, [
        "--collect-steps", "64", "--collect-envs", "2",
        "--context-len", "4", "--d-model", "32", "--n-layers", "1",
        "--n-heads", "2", "--batch-size", "4", "--total-steps", "6",
        "--steps-per-dispatch", "3",
        "--warmup-steps", "2", "--eval-envs", "2", "--eval-steps", "8",
        "--print-interval", "3",
    ]))
    assert "eval/episodic_return" in out
