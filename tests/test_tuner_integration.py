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
