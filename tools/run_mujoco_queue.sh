#!/bin/bash
# Sequential MuJoCo evidence runs (single-core box): logs to runs_mujoco/.
# Reference targets (cleanrl docs, 1M steps, HalfCheetah):
#   ppo_continuous_action 1714.26±674 | sac 9634±1423 | td3 9018±1078 | ddpg 9260±643
set -u
cd "$(dirname "$0")/.."
mkdir -p runs_mujoco
run() {
  name="$1"; shift
  echo "=== $name: $* ==="
  nice -n 19 python -u "$@" >"runs_mujoco/$name.log" 2>&1
  echo "=== $name done rc=$? ==="
}
run ppo_hc_s1 scripts/ppo_continuous_action.py --platform cpu --env-id HalfCheetah-v4 \
  --num-envs 1 --total-timesteps 1000000 --seed 1 --print-interval 20
run ppo_hc_s2 scripts/ppo_continuous_action.py --platform cpu --env-id HalfCheetah-v4 \
  --num-envs 1 --total-timesteps 1000000 --seed 2 --print-interval 20
run sac_hc_s1 scripts/sac_continuous_action.py --platform cpu --env-id HalfCheetah-v4 \
  --total-timesteps 1000000 --buffer-size 1000000 --seed 1 --print-interval 50
run td3_hc_s1 scripts/td3_continuous_action.py --platform cpu --env-id HalfCheetah-v4 \
  --total-timesteps 1000000 --buffer-size 1000000 --seed 1 --print-interval 50
run ddpg_hc_s1 scripts/ddpg_continuous_action.py --platform cpu --env-id HalfCheetah-v4 \
  --total-timesteps 1000000 --buffer-size 1000000 --seed 1 --print-interval 50
run ppo_hc_s3 scripts/ppo_continuous_action.py --platform cpu --env-id HalfCheetah-v4 \
  --num-envs 1 --total-timesteps 1000000 --seed 3 --print-interval 20
echo "ALL DONE"
run ppo_hopper_s1 scripts/ppo_continuous_action.py --platform cpu --env-id Hopper-v4 \
  --num-envs 1 --total-timesteps 1000000 --seed 1 --print-interval 20
run ppo_walker_s1 scripts/ppo_continuous_action.py --platform cpu --env-id Walker2d-v4 \
  --num-envs 1 --total-timesteps 1000000 --seed 1 --print-interval 20
echo "EXTENDED QUEUE DONE"
run rpo_ballincup scripts/rpo_continuous_action.py --platform cpu --env-id dm_control/ball_in_cup-catch \
  --num-envs 1 --total-timesteps 2000000 --seed 1 --print-interval 20
echo "RPO DONE"
