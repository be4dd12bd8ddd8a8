#!/bin/bash
# Round-4 lane E: reacher-easy at the reference's EQUAL budget — 8M steps,
# rpo_alpha=0.01 (the reference's own Reacher-class tuning note,
# rpo.md:39).  Verdict missing #4: best half-budget read was 642.7
# last-40 / 741.4 last-10 at 4M; the ref band is 716.89 +- 50.07 at 8M
# (rpo.md:116+).  Pure-CPU lane (dm_control stepping + XLA:CPU update;
# --platform cpu) — needs no TPU probe.
#
# Launch detached:
#   setsid nohup bash tools/run_r4e_reacher_8m.sh > runs_mujoco/r4e_lane.log 2>&1 &
#   echo $! > /tmp/r4e.pid
set -u
cd "$(dirname "$0")/.."
mkdir -p runs_mujoco
echo "=== rpo_reacher_easy_alpha001_8m $(date -u +%H:%M:%S) ==="
python -u scripts/rpo_continuous_action.py --env-id dm_control/reacher-easy \
  --platform cpu --num-envs 1 --total-timesteps 8000000 --seed 1 \
  --rpo-alpha 0.01 --print-interval 20 \
  >> runs_mujoco/rpo_reacher_alpha001_8m.log 2>&1
echo "=== reacher alpha001 8m done rc=$? $(date -u +%H:%M:%S) ==="
echo "R4E LANE DONE"
