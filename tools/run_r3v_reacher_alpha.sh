#!/bin/bash
# reacher-easy retry with the reference's OWN tuning note: rpo.md:39
# recommends --rpo-alpha 0.01 for Reacher-morphology tasks (large default
# alpha over-perturbs the mean when the target is close — exactly the
# oscillation the 4M default-alpha run showed: windows 0-995).
# reacher-easy is the one dm_control env of seven measured still below the
# reference band (617 @ 4M vs 716.89 +- 50.07 @ 8M).  2M budget, CPU
# platform (immune to the tunnel outage).
#
# Launch detached:
#   setsid nohup bash tools/run_r3v_reacher_alpha.sh > runs_mujoco/r3v_lane.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p runs_mujoco
echo "=== rpo_reacher_easy_alpha001_2m ==="
python -u scripts/rpo_continuous_action.py --env-id dm_control/reacher-easy \
  --platform cpu --num-envs 1 --total-timesteps 2000000 --seed 1 \
  --rpo-alpha 0.01 --print-interval 20 \
  > runs_mujoco/rpo_reacher_alpha001_2m.log 2>&1
echo "=== reacher alpha001 done rc=$? ==="
echo "R3V LANE DONE"
