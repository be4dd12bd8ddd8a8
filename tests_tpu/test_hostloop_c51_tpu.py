"""Hardware smoke: the C51 host-loop path on a real chip.

C51 was the workhorse of round 4's headline value result (C51-BRICK 2-seed
greedy 47.3 +/- 1.8, RESULTS.md) yet had no TPU-side test — DQN and PPO
host loops were covered, the categorical projection only on the CPU mesh.
This drives scripts/c51_rom.py on a real BRICK pool for a handful of pool
steps with training + target syncs enabled and asserts the trainer reaches
its greedy eval with finite numbers (round-5 verdict item 9).

Run manually (the tests/ CPU conftest does not apply here):
    python -m pytest tests_tpu/test_hostloop_c51_tpu.py -q
"""

import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_REPO, "scripts"))


def test_brick_hostloop_c51_smoke(tmp_path):
    from c51_rom import Args, main

    args = Args(
        exp_name="tpu_smoke_c51",
        env_id="brick_native",
        num_envs=2,
        total_timesteps=256,  # 128 pool steps
        buffer_size=1024,
        batch_size=32,
        learning_starts=64,  # categorical updates + target syncs run
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
