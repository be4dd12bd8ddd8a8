"""Host-loop DQN on the real RALLY cartridge (algos/offpolicy/hostloop_dqn).

The DQN analog of the ROM PPO host loop: emulation on the host, obs
synthesis + epsilon-greedy acting + int8 replay + TD updates in one jitted
call per pool step, with the TD math shared verbatim with the fused device
path (dqn.dqn_td_update — reference: cleanrl/dqn_atari_jax.py:186-199).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmtrl_tpu.algos.offpolicy import DQNConfig
from mmtrl_tpu.algos.offpolicy.hostloop_dqn import (
    _dequant,
    _quant,
    make_dqn_hostloop,
    run_dqn_hostloop,
)
from mmtrl_tpu.envs.homebrew_native import NativeHomebrew
from mmtrl_tpu.models import QNetwork


@pytest.fixture(scope="module")
def env():
    e = NativeHomebrew(num_envs=2, seed=3, frameskip=8, episode_steps=60)
    yield e
    e.close()


def test_quant_roundtrip_error_bound():
    x = jnp.linspace(-1.0, 1.0, 513).reshape(1, 513)
    err = jnp.abs(_dequant(_quant(x)) - x).max()
    assert float(err) <= 0.5 / 127.0 + 1e-6


def test_stepfn_stores_acts_trains(env):
    n = env.num_envs
    cfg = DQNConfig(
        total_timesteps=4000,
        num_envs=n,
        buffer_size=256,
        batch_size=16,
        learning_starts=8,
        train_frequency=1,
        target_network_frequency=4,
        learning_rate=1e-3,
    )
    model = QNetwork(num_actions=env.num_actions, input_scale=1.0)
    init_runner, step_fn, act_greedy = make_dqn_hostloop(env, model, cfg)
    runner = jax.jit(init_runner)(jax.random.PRNGKey(0))
    step_jit = jax.jit(step_fn)

    frames, audio = env._host_reset()
    audio_u8 = np.rint(audio * 15.0).astype(np.uint8)
    reward = np.zeros(n, np.float32)
    done = np.zeros(n, np.uint8)
    action = np.zeros(n, np.int32)
    store = False
    losses = []
    for t in range(14):
        frames_fed, audio_fed = frames, audio_u8
        runner, a_dev, metrics = step_jit(
            runner, frames, audio_u8, reward, done, action, np.bool_(store)
        )
        store = True
        action = np.asarray(a_dev)
        assert action.shape == (n,)
        assert (action >= 0).all() and (action < env.num_actions).all()
        frames, audio, kd, ld, done, win, score, _life = env._host_step(action)
        audio_u8 = np.rint(audio * 15.0).astype(np.uint8)
        reward = np.asarray(env._reward(kd, ld, win), np.float32)
        losses.append(float(metrics["td_loss"]))

    # 13 of the 14 calls stored a batch of n transitions (first call skips).
    assert int(jax.device_get(runner.buffer.size)) == 13 * n
    assert int(jax.device_get(runner.global_step)) == 13 * n
    # Past learning_starts (8 transitions) the TD update fires and is finite.
    assert np.isfinite(losses).all()
    assert any(ls != 0.0 for ls in losses[6:])

    # Pending obs must match the synth of the inputs fed to the LAST call.
    obs_now = env._obs(jnp.asarray(frames_fed), jnp.asarray(audio_fed) / 15.0)
    np.testing.assert_allclose(
        np.asarray(runner.pending_obs), np.asarray(obs_now), atol=1e-5
    )

    a = jax.jit(act_greedy)(runner.train_state.params, frames, audio_u8)
    assert np.asarray(a).shape == (n,)


def test_run_dqn_hostloop_end_to_end(env, tmp_path, monkeypatch):
    monkeypatch.setenv("MMTRL_RUN_ROOT", str(tmp_path))

    class A:
        exp_name = "dqn_rom_test"
        seed = 5
        env_id = "rally_native"
        print_interval = 1
        save_interval = 0
        save_dir = str(tmp_path)
        track = False
        capture_video = False

    cfg = DQNConfig(
        total_timesteps=240,
        num_envs=env.num_envs,
        buffer_size=256,
        batch_size=16,
        learning_starts=16,
        train_frequency=1,
        target_network_frequency=8,
    )
    model = QNetwork(num_actions=env.num_actions, input_scale=1.0)
    result = run_dqn_hostloop(env, model, cfg, A(), eval_steps=70)
    assert result["global_step"] >= 240
    # episode cap is 60 env steps, so the 70-step eval closes >=1 episode
    assert result["eval_episodes"] >= 1
    assert np.isfinite(result["eval_episodic_return"])


def test_run_c51_hostloop_end_to_end(env, tmp_path, monkeypatch):
    """The C51 hooks (scripts/c51_rom.py) through the shared host loop:
    expected-Q greedy acting + c51_td_update (the same function the fused
    device path runs) on the real RALLY cartridge."""
    import optax

    from mmtrl_tpu.algos.offpolicy.c51 import c51_td_update
    from mmtrl_tpu.models import DistributionalQNetwork

    monkeypatch.setenv("MMTRL_RUN_ROOT", str(tmp_path))

    class A:
        exp_name = "c51_rom_test"
        seed = 7
        env_id = "rally_native"
        print_interval = 1
        save_interval = 0
        save_dir = str(tmp_path)
        track = False
        capture_video = False

    cfg = DQNConfig(
        total_timesteps=240,
        num_envs=env.num_envs,
        buffer_size=256,
        batch_size=16,
        learning_starts=16,
        train_frequency=1,
        target_network_frequency=8,
    )
    n_atoms = 11
    model = DistributionalQNetwork(
        num_actions=env.num_actions, n_atoms=n_atoms, input_scale=1.0
    )
    atoms = jnp.linspace(-10.0, 10.0, n_atoms)

    def greedy_fn(params, obs):
        pmfs = model.apply(params, obs)
        return jnp.argmax((pmfs * atoms).sum(axis=-1), axis=-1)

    def update_fn(ts, batch):
        return c51_td_update(model, atoms, cfg.gamma, ts, batch)

    result = run_dqn_hostloop(
        env,
        model,
        cfg,
        A(),
        eval_steps=70,
        greedy_fn=greedy_fn,
        update_fn=update_fn,
        tx=optax.adam(2.5e-4, eps=0.01 / cfg.batch_size),
    )
    assert result["global_step"] >= 240
    assert result["eval_episodes"] >= 1
    assert np.isfinite(result["eval_episodic_return"])


def test_run_dqn_hostloop_resume(env, tmp_path, monkeypatch, capsys):
    """Round-4 resume semantics (hostloop_dqn.py): a second run restores the
    checkpointed train state into a fresh runner (cold replay ring) and
    trains on — the outage-recovery path the r4 lanes rely on."""
    import glob as _glob

    monkeypatch.setenv("MMTRL_RUN_ROOT", str(tmp_path))

    class A:
        exp_name = "dqn_resume_test"
        seed = 11
        env_id = "rally_native"
        print_interval = 1
        save_interval = 1  # save every 50 pool steps
        save_dir = str(tmp_path)
        load_from = ""
        track = False
        capture_video = False

    cfg = DQNConfig(
        total_timesteps=240,
        num_envs=env.num_envs,
        buffer_size=256,
        batch_size=16,
        learning_starts=16,
        train_frequency=1,
        target_network_frequency=8,
    )
    model = QNetwork(num_actions=env.num_actions, input_scale=1.0)
    run_dqn_hostloop(env, model, cfg, A(), eval_steps=0)
    ckpts = _glob.glob(str(tmp_path) + "/rally_native__dqn_resume_test__*")
    assert ckpts, "save_interval produced no checkpoint"

    class B(A):
        exp_name = "dqn_resume_test_b"
        seed = 12
        save_interval = 0
        load_from = sorted(ckpts)[-1]

    result = run_dqn_hostloop(env, model, cfg, B(), eval_steps=0)
    out = capsys.readouterr().out
    assert "resumed train state from" in out
    assert result["global_step"] >= 240
