#!/bin/bash
# reacher-easy, rpo_alpha=0.01 (the reference's own Reacher-class tuning
# note, rpo.md:39) at the 4M budget that lifted the default-alpha run
# 519 -> 617.  The 2M alpha=0.01 read was 566 with a bimodal window
# (episodes ~960 or ~0) — the env rewards only target acquisition, so the
# mean tracks hit rate; more steps raise it.  Ref band: 716.89 +- 50.07 @ 8M.
#
# Launch detached:
#   setsid nohup bash tools/run_r3w_reacher_alpha_4m.sh > runs_mujoco/r3w_lane.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p runs_mujoco
echo "=== rpo_reacher_easy_alpha001_4m ==="
python -u scripts/rpo_continuous_action.py --env-id dm_control/reacher-easy \
  --platform cpu --num-envs 1 --total-timesteps 4000000 --seed 1 \
  --rpo-alpha 0.01 --print-interval 20 \
  > runs_mujoco/rpo_reacher_alpha001_4m.log 2>&1
echo "=== reacher alpha001 4m done rc=$? ==="
echo "R3W LANE DONE"
