"""Offline DT on a real cartridge (scripts/dt_rom.py): host-loop collection
-> stream-major buffer -> scanned offline training -> return-conditioned
host-loop eval, all through the emulated RALLY ROM at tiny scale."""

import sys

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _scripts_on_path():
    import os

    p = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
    sys.path.insert(0, p)
    yield
    sys.path.remove(p)


def test_dt_rom_pipeline(tmp_path, monkeypatch):
    monkeypatch.setenv("MMTRL_RUN_ROOT", str(tmp_path))
    import dt_rom

    out = dt_rom.main(dt_rom.cli(dt_rom.Args, [
        "--env-id", "rally_native",
        "--episode-steps", "60",
        "--collect-envs", "2",
        "--collect-steps", "240",
        "--context-len", "4",
        "--d-model", "32",
        "--n-layers", "1",
        "--n-heads", "2",
        "--batch-size", "4",
        "--total-steps", "6",
        "--steps-per-dispatch", "3",
        "--warmup-steps", "2",
        "--max-timestep", "64",
        "--eval-steps", "140",
        "--target-return", "3",
        "--print-interval", "3",
        "--save-dir", str(tmp_path),
    ]))
    # Collection saw whole episodes (cap 60 steps, 120 pool steps x 2 envs).
    assert out["behavior/episodes"] >= 2
    # The 140-step eval closes at least one episode per env and returns
    # finite statistics through the real cartridge.
    assert out["eval/episodes"] >= 1
    assert np.isfinite(out["eval/episodic_return"])


@pytest.mark.parametrize("kind", ["dqn", "c51"])
def test_dt_rom_q_behavior(tmp_path, monkeypatch, kind):
    """The round-4 DT-BRICK leg collects behavior data from a hostloop
    DQN/C51 checkpoint (the only policies that survive a host reboot via
    the tracked preserve copies).  Exercises --policy-kind on a tiny saved
    Q train state through the real RALLY cartridge."""
    monkeypatch.setenv("MMTRL_RUN_ROOT", str(tmp_path))
    import jax
    import jax.numpy as jnp
    import optax

    import dt_rom
    from mmtrl_tpu.algos.offpolicy.dqn import DQNTrainState
    from mmtrl_tpu.core.checkpoint import save_run
    from mmtrl_tpu.envs.homebrew_native import make_native_env
    from mmtrl_tpu.models import DistributionalQNetwork, QNetwork

    env = make_native_env("rally_native", num_envs=1, seed=0, episode_steps=8)
    try:
        obs_shape = tuple(env.observation_space.shape)
        n_act = env.num_actions
    finally:
        env.close()

    if kind == "dqn":
        model = QNetwork(num_actions=n_act, input_scale=1.0)
    else:
        model = DistributionalQNetwork(num_actions=n_act, n_atoms=11, input_scale=1.0)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1,) + obs_shape))
    ts = DQNTrainState.create(
        apply_fn=model.apply, params=params, target_params=params,
        tx=optax.adam(1e-4),
    )
    ckpt = save_run(ts, f"{kind}_behavior", str(tmp_path))

    out = dt_rom.main(dt_rom.cli(dt_rom.Args, [
        "--env-id", "rally_native",
        "--episode-steps", "60",
        "--policy-from", ckpt,
        "--policy-kind", kind,
        "--policy-n-atoms", "11",
        "--policy-epsilon", "0.3",
        "--collect-envs", "2",
        "--collect-steps", "240",
        "--context-len", "4",
        "--d-model", "32",
        "--n-layers", "1",
        "--n-heads", "2",
        "--batch-size", "4",
        "--total-steps", "3",
        "--steps-per-dispatch", "3",
        "--warmup-steps", "2",
        "--max-timestep", "64",
        "--eval-steps", "140",
        "--target-return", "3",
        "--print-interval", "3",
        "--save-dir", str(tmp_path),
    ]))
    assert out["behavior/episodes"] >= 2
    assert np.isfinite(out["eval/episodic_return"])
