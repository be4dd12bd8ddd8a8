#!/bin/bash
# Classic-control evidence runs on the TPU (device-resident envs).
# Waits for any running ppg.py to finish first (shares the one chip).
set -u
cd "$(dirname "$0")/.."
# Wait for a prior chip-owning run recorded in /tmp/ppg_procmaze.pid (pid
# liveness, not process-name patterns — shell wrappers can embed the name).
while [ -f /tmp/ppg_procmaze.pid ] && ps -p "$(cat /tmp/ppg_procmaze.pid | head -1)" > /dev/null 2>&1; do
  sleep 30
done
run() {
  name="$1"; shift
  echo "=== $name: $* ==="
  python -u "$@" >"runs_mujoco/$name.log" 2>&1
  echo "=== $name done rc=$? ==="
}
# Baselines (reference docs): ppo acrobot -89.93+-6.34, mountaincar -200.0;
# dqn acrobot -91.54+-7.20, mountaincar -194.95+-8.48 (500k steps).
run ppo_acrobot scripts/ppo.py --env-id Acrobot-v1 --total-timesteps 500000 --seed 1 --print-interval 50
run ppo_mountaincar scripts/ppo.py --env-id MountainCar-v0 --total-timesteps 500000 --seed 1 --print-interval 50
run dqn_acrobot scripts/dqn.py --env-id Acrobot-v1 --total-timesteps 500000 --seed 1 --print-interval 50
run dqn_mountaincar scripts/dqn.py --env-id MountainCar-v0 --total-timesteps 500000 --seed 1 --print-interval 50
echo "TPU QUEUE DONE"
