"""The round-end harvest gate (tools/harvest_round.py).

Rounds 2-4 each leaked finished lane results (final evals present in
runs_mujoco/*.log but absent from RESULTS.md) and untracked BENCH/
MULTICHIP artifacts.  The gate makes that state a hard failure; these
tests pin its detection logic on synthetic fixtures.
"""

import os
import subprocess
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)
from harvest_round import find_unrecorded_logs, find_untracked_artifacts  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mk(tmp_path, logs, results="", allow=""):
    runs = tmp_path / "runs_mujoco"
    runs.mkdir()
    for name, text in logs.items():
        (runs / name).write_text(text)
    (tmp_path / "RESULTS.md").write_text(results)
    (tmp_path / "allow.txt").write_text(allow)
    return (
        str(runs),
        str(tmp_path / "RESULTS.md"),
        str(tmp_path / "allow.txt"),
    )


def test_flags_final_eval_not_in_results(tmp_path):
    runs, res, allow = _mk(
        tmp_path,
        {"lane_x.log": "step 1\nfinal greedy eval: return=45.53 over 535 episodes\n"},
    )
    assert find_unrecorded_logs(runs, res, allow) == ["lane_x.log"]


def test_cited_log_passes(tmp_path):
    runs, res, allow = _mk(
        tmp_path,
        {"lane_x.log": "final greedy eval: return=45.53\n"},
        results="| row | (runs_mujoco/lane_x.log) |\n",
    )
    assert find_unrecorded_logs(runs, res, allow) == []


def test_no_final_marker_passes(tmp_path):
    runs, res, allow = _mk(
        tmp_path, {"inflight.log": "step=100 return=3.0\nstill training\n"}
    )
    assert find_unrecorded_logs(runs, res, allow) == []


def test_all_marker_kinds_flagged(tmp_path):
    runs, res, allow = _mk(
        tmp_path,
        {
            "a.log": "final return-conditioned eval: eval/episodic_return=45.74\n",
            "b.log": "=== transfer sweep results (best first) ===\n",
            "c.log": "R4M LANE DONE done=1000000\n",
        },
    )
    assert find_unrecorded_logs(runs, res, allow) == ["a.log", "b.log", "c.log"]


def test_allowlist_exact_and_glob(tmp_path):
    runs, res, allow = _mk(
        tmp_path,
        {
            "r9z_lane.log": "LANE DONE\n",
            "legacy.log": "final greedy eval: 1.0\n",
            "new.log": "final greedy eval: 2.0\n",
        },
        allow="# comment\n*_lane.log\nlegacy.log\n",
    )
    assert find_unrecorded_logs(runs, res, allow) == ["new.log"]


def test_untracked_artifact_detection(tmp_path):
    subprocess.run(["git", "init", "-q"], cwd=tmp_path, check=True)
    (tmp_path / "BENCH_r99.json").write_text("{}")
    (tmp_path / "unrelated.txt").write_text("x")
    bad = find_untracked_artifacts(str(tmp_path))
    assert bad == ["BENCH_r99.json"]


def test_real_repo_is_clean():
    """The gate passing on the actual repo IS the round invariant; a
    failure here means a finished lane's result needs recording."""
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "harvest_round.py"), REPO],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
