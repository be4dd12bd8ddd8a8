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
