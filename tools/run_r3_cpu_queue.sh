#!/bin/bash
# Round-3 sequential CPU evidence queue (single-core box): logs to runs_mujoco/.
# 1) Seed-harden Hopper/Walker2d PPO (VERDICT weak #3): seeds 2,3 at 1M.
# 2) RPO dm_control breadth (VERDICT missing #4): 5 headline envs, 2M steps.
#    Reference 8M targets (docs/rl-algorithms/rpo.md): cartpole-swingup 613.46,
#    cheetah-run 565.51, finger-spin 848.67, reacher-easy 716.89, walker-walk 787.11.
# 3) RPO ball_in_cup seeds 2,3 (seed-harden the round-2 headline row).
set -u
cd "$(dirname "$0")/.."
mkdir -p runs_mujoco
run() {
  name="$1"; shift
  echo "=== $name: $* ==="
  nice -n 19 python -u "$@" >"runs_mujoco/$name.log" 2>&1
  echo "=== $name done rc=$? ==="
}
run ppo_hopper_s2 scripts/ppo_continuous_action.py --platform cpu --env-id Hopper-v4 \
  --num-envs 1 --total-timesteps 1000000 --seed 2 --print-interval 20
run ppo_walker_s2 scripts/ppo_continuous_action.py --platform cpu --env-id Walker2d-v4 \
  --num-envs 1 --total-timesteps 1000000 --seed 2 --print-interval 20
run ppo_hopper_s3 scripts/ppo_continuous_action.py --platform cpu --env-id Hopper-v4 \
  --num-envs 1 --total-timesteps 1000000 --seed 3 --print-interval 20
run ppo_walker_s3 scripts/ppo_continuous_action.py --platform cpu --env-id Walker2d-v4 \
  --num-envs 1 --total-timesteps 1000000 --seed 3 --print-interval 20
run rpo_cartpole_swingup scripts/rpo_continuous_action.py --platform cpu \
  --env-id dm_control/cartpole-swingup --num-envs 1 --total-timesteps 2000000 \
  --seed 1 --print-interval 20
run rpo_reacher_easy scripts/rpo_continuous_action.py --platform cpu \
  --env-id dm_control/reacher-easy --num-envs 1 --total-timesteps 2000000 \
  --seed 1 --print-interval 20
run rpo_finger_spin scripts/rpo_continuous_action.py --platform cpu \
  --env-id dm_control/finger-spin --num-envs 1 --total-timesteps 2000000 \
  --seed 1 --print-interval 20
run rpo_cheetah_run scripts/rpo_continuous_action.py --platform cpu \
  --env-id dm_control/cheetah-run --num-envs 1 --total-timesteps 2000000 \
  --seed 1 --print-interval 20
run rpo_walker_walk scripts/rpo_continuous_action.py --platform cpu \
  --env-id dm_control/walker-walk --num-envs 1 --total-timesteps 2000000 \
  --seed 1 --print-interval 20
echo "R3 CORE QUEUE DONE"
run rpo_ballincup_s2 scripts/rpo_continuous_action.py --platform cpu \
  --env-id dm_control/ball_in_cup-catch --num-envs 1 --total-timesteps 2000000 \
  --seed 2 --print-interval 20
run rpo_ballincup_s3 scripts/rpo_continuous_action.py --platform cpu \
  --env-id dm_control/ball_in_cup-catch --num-envs 1 --total-timesteps 2000000 \
  --seed 3 --print-interval 20
echo "R3 EXTENDED QUEUE DONE"
