#!/bin/bash
# Round-end harvest gate: fails while any finished lane result is
# unrecorded in RESULTS.md or BENCH/MULTICHIP artifacts are untracked.
# Run before EVERY round-end commit.  See tools/harvest_round.py.
cd "$(dirname "$0")/.."
exec python tools/harvest_round.py .
