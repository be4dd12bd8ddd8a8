"""Hardware smoke: the host-loop VALUE-learning path on a real chip.

Round 4's workhorse lanes (the BRICK DQN/C51 finals) run scripts/dqn_rom.py
/ c51_rom.py through algos/offpolicy/hostloop_dqn.py — replay ring, TD
update, and target sync jitted on the TPU, the C++ cartridge pool stepped
on host.  This smoke drives a real BRICK pool for a handful of pool steps
with training enabled (learning_starts below the budget) and asserts the
trainer reaches its greedy eval with finite numbers — the value-learning
analog of test_hostloop_tpu.py's PPO smoke.

Run manually (the tests/ CPU conftest does not apply here):
    python -m pytest tests_tpu/test_hostloop_dqn_tpu.py -q
"""

import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_REPO, "scripts"))


def test_brick_hostloop_dqn_smoke(tmp_path):
    from dqn_rom import Args, main

    args = Args(
        exp_name="tpu_smoke_dqn",
        env_id="brick_native",
        num_envs=2,
        total_timesteps=256,  # 128 pool steps
        buffer_size=1024,
        batch_size=32,
        learning_starts=64,  # training + target syncs actually run
        train_frequency=2,
        target_network_frequency=50,
        episode_steps=40,
        eval_steps=150,
        print_interval=1,
        save_interval=0,
        save_dir=str(tmp_path),
        seed=0,
    )
    result = main(args)
    assert result is not None
    assert result["global_step"] >= 256
    assert np.isfinite(result.get("eval_episodic_return", np.nan)), result
