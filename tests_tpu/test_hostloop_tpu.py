"""Hardware smoke: the host-loop trainer path on a real chip.

The host-loop mode (policy/update jitted on the TPU, cartridge emulation
stepped on host — algos/ppo/hostloop.py) is the workhorse behind every
ROM-native RESULTS.md row, but until round 4 it was validated only by the
training lanes themselves.  This smoke runs a real BRICK cartridge pool
for a handful of updates end-to-end (native 2600 emulation -> on-device
obs synthesis -> recurrent CASL policy -> PPO update -> greedy eval) and
asserts the trainer produces finite numbers.

Run manually (the tests/ CPU conftest does not apply here):
    python -m pytest tests_tpu/test_hostloop_tpu.py -q
"""

import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_REPO, "scripts"))


def test_brick_hostloop_ppo_smoke(tmp_path):
    from brick_ppo import Args, main

    args = Args(
        exp_name="tpu_smoke",
        num_envs=2,
        num_steps=32,
        total_timesteps=256,  # 4 updates
        num_minibatches=1,
        update_epochs=1,
        conv_size="small",
        eval_steps=200,
        print_interval=1,
        save_interval=0,
        save_dir=str(tmp_path),
        seed=0,
    )
    result = main(args)
    assert result is not None
    # The trainer must have stepped the full budget and produced a finite
    # greedy eval on the real cartridge.
    assert np.isfinite(result.get("eval_episodic_return", np.nan)), result
