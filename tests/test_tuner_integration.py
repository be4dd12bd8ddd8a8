"""Tuner end-to-end smoke: one trial, one seed, tiny budget — mirrors the
reference's tests/test_tuner.py (1 trial, 1200 steps)."""

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_tuner_one_trial(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from mmtrl_tpu.utils.tuner import Tuner

    tuner = Tuner(
        script=os.path.join(REPO, "scripts", "ppo.py"),
        metric="charts/episodic_return",
        metric_last_n_average_window=10,
        target_scores={"CartPole-v1": (0, 500)},
        params_fn=lambda trial: {
            "learning-rate": trial.suggest_float("learning-rate", 1e-4, 1e-3, log=True),
            "total-timesteps": 1024,
            "num-envs": 2,
            "num-steps": 64,
            "num-minibatches": 2,
            "update-epochs": 1,
            "print-interval": 2,
        },
        storage=str(tmp_path / "hpopt.log"),
    )
    results = tuner.tune(num_trials=1, num_seeds=1)
    assert len(results) == 1
    assert results[0]["score"] > -float("inf")
    assert "learning-rate" in results[0]["params"]


def test_tuner_resume_skips_recorded_trials(tmp_path):
    """resume=True seeds history from the storage journal and re-runs only
    the missing trial indices with their original (index-deterministic)
    parameter points — the round-5 sweep-completion mechanism."""
    import json

    from mmtrl_tpu.utils.tuner import Trial, Tuner, _PRIMES, _van_der_corput

    storage = tmp_path / "study.log"
    # Pretend trials 0 and 2 already ran.
    storage.write_text(
        json.dumps({"trial": 0, "params": {"x": 1}, "score": 0.5}) + "\n"
        + json.dumps({"trial": 2, "params": {"x": 3}, "score": 0.7}) + "\n"
        + json.dumps({"trial": 9, "params": {"x": 9}, "score": None}) + "\n"
    )
    ran = []

    class _T(Tuner):
        def _run_script(self, argv):
            ran.append(argv)
            return 1.0

    tuner = _T(
        script="unused",
        metric="m",
        target_scores={"env": (0.0, 2.0)},
        params_fn=lambda trial: {
            "lr": trial.suggest_float("lr", 0.1, 1.0),
            "total-timesteps": 8,
        },
        storage=str(storage),
    )
    results = tuner.tune(num_trials=4, num_seeds=1, resume=True)
    assert len(results) == 4
    by_trial = {r["trial"]: r for r in results}
    # Resumed trials keep their recorded scores; only 1 and 3 executed.
    assert by_trial[0]["score"] == 0.5 and by_trial[2]["score"] == 0.7
    assert len(ran) == 2
    # The re-run trial's parameter point is the index-deterministic one.
    expected_lr = 0.1 + _van_der_corput(2, _PRIMES[0]) * 0.9
    assert abs(by_trial[1]["params"]["lr"] - expected_lr) < 1e-12
    # The null-score (failed) record is NOT treated as done.
    assert 9 not in by_trial
