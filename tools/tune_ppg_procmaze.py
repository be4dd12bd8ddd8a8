#!/usr/bin/env python
"""PPG/ProcMaze hyperparameter sweep — the tuner exercised in anger
(the reference's tuner_example.py:5-31 pattern, real search budget).

Objective: training episodic return on procmaze(num_levels=800) at a 2M
step probe budget; the winning config is then promoted to a full 10M run
with the held-out [800,1000) generalization eval (scripts/ppg.py prints
it at exit).

    python tools/tune_ppg_procmaze.py [num_trials]
"""

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "scripts"))  # scripts import _common

from mmtrl_tpu.utils.tuner import Tuner  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def params_fn(trial):
    return {
        "env-id": "procmaze",
        "num-levels": 800,
        "total-timesteps": 2_000_000,
        "num-envs": 64,
        "num-steps": 64,
        "learning-rate": trial.suggest_float(
            "learning-rate", 1e-4, 1.2e-3, log=True
        ),
        "ent-coef": trial.suggest_float("ent-coef", 0.0, 0.03),
        "e-auxiliary": trial.suggest_int("e-auxiliary", 3, 8),
        "beta-clone": trial.suggest_float("beta-clone", 0.5, 2.0, log=True),
        "n-iteration": trial.suggest_categorical("n-iteration", [16, 32]),
        "num-aux-minibatches": 16,
        "print-interval": 10,
    }


def main():
    num_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    tuner = Tuner(
        script=os.path.join(REPO, "scripts", "ppg.py"),
        metric="charts/episodic_return",
        metric_last_n_average_window=20,
        # random ~ -2.56, solved ~ +9.5 (docs/rl-algorithms/ppg.md)
        target_scores={"procmaze": (-2.56, 9.5)},
        params_fn=params_fn,
        storage=os.path.join(REPO, "runs_tuner", "ppg_procmaze_study.log"),
        study_name="ppg_procmaze",
    )
    results = tuner.tune(num_trials=num_trials, num_seeds=1)
    results.sort(key=lambda r: r["score"], reverse=True)
    print("\n=== sweep results (best first) ===")
    for r in results:
        print(r)


if __name__ == "__main__":
    main()
