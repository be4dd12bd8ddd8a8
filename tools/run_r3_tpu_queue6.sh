#!/bin/bash
# Round-3 MountainCar seed-hardening on TPU device envs (the CPU queue2
# version would have waited hours behind the RPO breadth runs; the device
# envs run at ~8k SPS on-chip, so the whole matrix costs ~20 minutes).
# C51 seeds 4-6 and DQN seeds 2-3, 500k steps, reference defaults.
# Targets: c51.md MountainCar -174.30+-36.35 jax / -166.38+-27.94 torch;
#          dqn.md MountainCar -194.95+-8.48 training curve.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs_mujoco
run() {
  name="$1"; shift
  echo "=== $name: $* ==="
  nice -n 10 python -u "$@" >"runs_mujoco/$name.log" 2>&1
  echo "=== $name done rc=$? ==="
}
for seed in 4 5 6; do
  run c51_mc_s$seed scripts/c51.py --env-id MountainCar-v0 \
    --total-timesteps 500000 --seed $seed --print-interval 50
done
for seed in 2 3; do
  run dqn_mc_s$seed scripts/dqn.py --env-id MountainCar-v0 \
    --total-timesteps 500000 --seed $seed --print-interval 50
done
echo "TPU QUEUE6 DONE"
