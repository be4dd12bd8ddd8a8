#!/bin/bash
# Round-3 lane 17: relaunch of the dead r3o lane's REMAINING job.
# walker-walk 2M already completed (runs_mujoco/rpo_walker_walk.log,
# RESULTS.md row); only pendulum-swingup is missing from the RPO breadth
# set.  Reference (8M steps): RPO 774.30 +- 21.03, PPO 472.19 +- 385.47
# (docs/rl-algorithms/rpo.md).  2M budget, same recipe as the other
# dm_control rows.  Chained behind the r3g 4M reacher lane so the single
# host core keeps <= 3 env-stepping processes.
#
# Launch detached:
#   setsid nohup bash tools/run_r3q_pendulum.sh > runs_mujoco/r3q_lane.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p runs_mujoco
if [ -f /tmp/r3g_rpo4m.pid ]; then
  while kill -0 "$(cat /tmp/r3g_rpo4m.pid)" 2>/dev/null; do sleep 60; done
fi
echo "=== rpo_pendulum_swingup_2m ==="
python -u scripts/rpo_continuous_action.py --env-id dm_control/pendulum-swingup \
  --platform cpu --num-envs 1 --total-timesteps 2000000 --seed 1 \
  --print-interval 20 > runs_mujoco/rpo_pendulum_swingup_2m.log 2>&1
echo "=== pendulum done rc=$? ==="
echo "R3Q LANE DONE"
