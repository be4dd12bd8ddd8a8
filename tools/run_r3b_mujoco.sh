#!/bin/bash
# Round-3 MuJoCo lane restart after the host reboot: the hostloop queue
# died inside td3_hopper_s1 (179k/1M) and never reached the two DDPG runs.
# DDPG first (reference targets are lowest / reached earliest), TD3 Hopper
# last. Reference 1M targets (docs/rl-algorithms, v2 envs):
#   ddpg.md: Walker2d 1661.14+-250.01 | Hopper 1007.44+-148.29
#   td3.md:  Hopper   3162.21+-261.08 (jax 3564.07+-114.74)
set -u
cd "$(dirname "$0")/.."
mkdir -p runs_mujoco
run() {
  name="$1"; shift
  echo "=== $name: $* ==="
  python -u "$@" >"runs_mujoco/$name.log" 2>&1
  echo "=== $name done rc=$? ==="
}
COMMON="--host-loop --chunk-size 128 --total-timesteps 1000000 --buffer-size 1000000 --seed 1 --print-interval 50"
run ddpg_walker_s1 scripts/ddpg_continuous_action.py --env-id Walker2d-v4 $COMMON
run ddpg_hopper_s1 scripts/ddpg_continuous_action.py --env-id Hopper-v4   $COMMON
run td3_hopper_s1b scripts/td3_continuous_action.py  --env-id Hopper-v4   $COMMON
echo "MUJOCO LANE DONE"
