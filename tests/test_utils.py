"""Experiment-ops tests: benchmark command construction, tuner trial
suggestion engine + TB metric readback, plotting smoothing, resume manifest
round-trip — the reference's tests/test_utils.py / test_tuner.py roles."""

import json
import os

import numpy as np
import pytest

from mmtrl_tpu.utils.benchmark import build_commands, parse_args
from mmtrl_tpu.utils.plot import smooth
from mmtrl_tpu.utils.resume import journal_run, load_manifest, resume_command
from mmtrl_tpu.utils.tuner import Trial, _van_der_corput, read_metric_from_tensorboard


def test_benchmark_cross_product():
    args = parse_args(
        ["--command", "python scripts/ppo.py", "--env-ids", "A", "B",
         "--num-seeds", "2"]
    )
    cmds = build_commands(args)
    assert len(cmds) == 4
    assert "python scripts/ppo.py --env-id A --seed 1" in cmds
    assert "python scripts/ppo.py --env-id B --seed 2" in cmds


def test_tuner_trial_suggestions():
    trial = Trial(number=3, rng_value=lambda i: _van_der_corput(4, [2, 3, 5][i % 3]))
    lr = trial.suggest_float("lr", 1e-5, 1e-2, log=True)
    assert 1e-5 <= lr <= 1e-2
    n = trial.suggest_int("n", 1, 8)
    assert 1 <= n <= 8
    c = trial.suggest_categorical("c", ["a", "b"])
    assert c in ("a", "b")
    assert set(trial.params) == {"lr", "n", "c"}


def test_van_der_corput_stratifies():
    xs = [_van_der_corput(i, 2) for i in range(1, 17)]
    assert len(set(xs)) == 16
    assert all(0 <= x < 1 for x in xs)


def test_tb_metric_readback(tmp_path):
    from torch.utils.tensorboard import SummaryWriter

    run_dir = str(tmp_path / "run")
    w = SummaryWriter(run_dir)
    for i in range(10):
        w.add_scalar("charts/episodic_return", float(i), i)
    w.close()
    val = read_metric_from_tensorboard(run_dir, "charts/episodic_return", last_n=4)
    assert val == pytest.approx(np.mean([6, 7, 8, 9]))
    assert read_metric_from_tensorboard(run_dir, "missing", 4) is None


def test_smooth_ema():
    vals = np.array([0.0, 1.0, 1.0, 1.0])
    out = smooth(vals, weight=0.5)
    np.testing.assert_allclose(out, [0.0, 0.5, 0.75, 0.875])


def test_resume_manifest_roundtrip(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    journal_run("envA__exp__1__123", ["scripts/ppo.py", "--seed", "1"], "running")
    journal_run("envB__exp__1__124", ["scripts/ppo.py", "--seed", "2"], "running")
    journal_run("envB__exp__1__124", ["scripts/ppo.py", "--seed", "2"], "finished")
    runs = load_manifest()
    crashed = [r for r in runs.values() if r["status"] == "running"]
    assert [r["run_name"] for r in crashed] == ["envA__exp__1__123"]
    cmd = resume_command(crashed[0])
    assert "scripts/ppo.py --seed 1" in cmd


def test_plot_lane_segment_ledger_offsets(tmp_path):
    # Reboot-proof lanes restart global_step per segment; parse_log must
    # apply each ledger header's done= offset so resumed curves read as one
    # cumulative x-axis (tools/run_r4j_c51_brick.sh header format).
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from plot_lane import parse_log

    log = tmp_path / "lane.log"
    log.write_text(
        "=== segment attempt=1 done=0 remain=100 load='' 00:00:00 ===\n"
        "pool_step=1 global_step=10 episodic_return=1.0 score=1.0\n"
        "pool_step=2 global_step=20 episodic_return=2.0 score=2.0\n"
        "=== segment-end attempt=1 rc=1 seg=20 00:10:00 ===\n"
        "=== segment attempt=2 done=20 remain=80 load='--load-from x' 00:20:00 ===\n"
        "pool_step=1 global_step=10 episodic_return=3.0 score=3.0\n"
        "pool_step=2 global_step=20 episodic_return=4.0 score=4.0\n"
    )
    steps, rets, resumed = parse_log(str(log))
    assert steps.tolist() == [10, 20, 30, 40]
    assert rets.tolist() == [1.0, 2.0, 3.0, 4.0]
    assert resumed  # done>0 segment header seen -> caption notes the overlap
    steps_s, scores, _ = parse_log(str(log), field="score")
    assert steps_s.tolist() == [10, 20, 30, 40]
    assert scores.tolist() == [1.0, 2.0, 3.0, 4.0]
