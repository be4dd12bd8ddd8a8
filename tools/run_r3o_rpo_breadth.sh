#!/bin/bash
# Round-3 lane 15: widen the RPO dm_control headline set (round-2 VERDICT
# missing #4) with two envs where the reference's RPO-vs-PPO gap is the
# showcase (docs/rl-algorithms/rpo.md, 8M steps):
#   walker-walk       RPO 787.11 +- 125.97  (PPO 305.74 +- 92.15)
#   pendulum-swingup  RPO 774.30 +-  21.03  (PPO 472.19 +- 385.47)
# 2M budget each (the ball_in_cup/finger-spin rows show this recipe
# reaches the reference band at 1/4 budget).  Chained behind the r3g 4M
# lane so the single host core keeps <= 3 env-stepping processes.
#
# Launch detached:
#   setsid nohup bash tools/run_r3o_rpo_breadth.sh > runs_mujoco/r3o_lane.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p runs_mujoco
if [ -f /tmp/r3g_rpo4m.pid ]; then
  while kill -0 "$(cat /tmp/r3g_rpo4m.pid)" 2>/dev/null; do sleep 60; done
fi
run() {
  name="$1"; shift
  echo "=== $name: $* ==="
  python -u "$@" >"runs_mujoco/$name.log" 2>&1
  echo "=== $name done rc=$? ==="
}
COMMON="--platform cpu --num-envs 1 --total-timesteps 2000000 --seed 1 --print-interval 20"
run rpo_walker_walk_2m scripts/rpo_continuous_action.py --env-id dm_control/walker-walk $COMMON
run rpo_pendulum_swingup_2m scripts/rpo_continuous_action.py --env-id dm_control/pendulum-swingup $COMMON
echo "RPO BREADTH LANE DONE"
