#!/usr/bin/env python
"""Round-end harvest gate (round-5 verdict item 1, structural fix).

Rounds 2-4 each leaked finished results: lanes that completed after the
round snapshot held final evals that never made it into RESULTS.md, and
BENCH/MULTICHIP artifacts sat untracked.  This gate makes the leak loud:

  1. Every log under runs_mujoco/ that contains a FINAL-RESULT marker
     (``final greedy eval``, ``final return-conditioned eval``,
     ``transfer sweep results``, ``LANE DONE``) must be cited by filename
     in RESULTS.md — the repo convention is that every results row names
     its lane log — or listed in tools/harvest_allowlist.txt (legacy logs
     whose rows predate the filename-citation convention, plus scratch
     experiment logs that are not results rows).
  2. No BENCH_r*.json / MULTICHIP_r*.json may be untracked in git.

Exit 0 = clean (safe to snapshot the round); exit 1 = violations listed on
stderr.  Run ``bash tools/harvest_round.sh`` before any round-end commit.
Logic unit-tested in tests/test_harvest_gate.py.
"""

from __future__ import annotations

import fnmatch
import os
import re
import subprocess
import sys

FINAL_MARKERS = re.compile(
    r"(final greedy eval|final return-conditioned eval"
    r"|transfer sweep results|LANE DONE)"
)


def find_unrecorded_logs(runs_dir: str, results_path: str,
                         allowlist_path: str) -> list:
    """Logs with a final-result marker that RESULTS.md does not cite."""
    try:
        results = open(results_path, encoding="utf-8").read()
    except OSError:
        results = ""
    allow = set()
    if os.path.exists(allowlist_path):
        for line in open(allowlist_path, encoding="utf-8"):
            line = line.strip()
            if line and not line.startswith("#"):
                allow.add(line)
    bad = []
    if not os.path.isdir(runs_dir):
        return bad
    for name in sorted(os.listdir(runs_dir)):
        if not name.endswith(".log"):
            continue
        if any(fnmatch.fnmatch(name, pat) for pat in allow):
            continue
        path = os.path.join(runs_dir, name)
        try:
            text = open(path, encoding="utf-8", errors="replace").read()
        except OSError:
            continue
        if FINAL_MARKERS.search(text) and name not in results:
            bad.append(name)
    return bad


def find_untracked_artifacts(repo_root: str) -> list:
    """BENCH_r*/MULTICHIP_r* json files git does not track."""
    try:
        out = subprocess.run(
            ["git", "status", "--porcelain"], cwd=repo_root,
            capture_output=True, text=True, check=True,
        ).stdout
    except (OSError, subprocess.CalledProcessError):
        return []
    bad = []
    for line in out.splitlines():
        status, _, path = line.partition(" ")
        path = line[3:].strip()
        if line[:2] == "??" and re.match(
            r"(BENCH|MULTICHIP)_r\d+.*\.json$", os.path.basename(path)
        ):
            bad.append(path)
    return bad


def main(repo_root: str = ".") -> int:
    runs_dir = os.path.join(repo_root, "runs_mujoco")
    results = os.path.join(repo_root, "RESULTS.md")
    allowlist = os.path.join(repo_root, "tools", "harvest_allowlist.txt")
    unrecorded = find_unrecorded_logs(runs_dir, results, allowlist)
    untracked = find_untracked_artifacts(repo_root)
    ok = True
    for name in unrecorded:
        ok = False
        print(
            f"HARVEST GATE: runs_mujoco/{name} holds a final result "
            "not cited in RESULTS.md — record it (or allowlist a "
            "non-result scratch log)", file=sys.stderr,
        )
    for path in untracked:
        ok = False
        print(
            f"HARVEST GATE: {path} is untracked — `git add` the round "
            "artifact before the snapshot", file=sys.stderr,
        )
    if ok:
        print("harvest gate: clean")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "."))
