#!/bin/bash
# Round-3 TPU queue phase 2: waits for phase 1 (pid in /tmp/r3_tpu_queue.pid).
#   - MA retry with plain PPO defaults (the lr1e-3/gamma0.95 LSTM recipe drove
#     the shared CNN below the measured random floor of -10.17/slot)
#   - RND MountainCar intrinsic-weight variants (defaults stay at -200)
#   - PPG/ProcMaze tuner sweep (the tuner exercised in anger, VERDICT #5)
set -u
cd "$(dirname "$0")/.."
mkdir -p runs_mujoco
if [ -f /tmp/r3_tpu_queue.pid ]; then
  while kill -0 "$(cat /tmp/r3_tpu_queue.pid)" 2>/dev/null; do sleep 60; done
fi
run() {
  name="$1"; shift
  echo "=== $name: $* ==="
  python -u "$@" >"runs_mujoco/$name.log" 2>&1
  echo "=== $name done rc=$? ==="
}
run ma_minecraft_v2 scripts/ppo_ma_minecraft.py --num-envs 16 \
  --total-timesteps 8000000 --clip-rewards False --seed 1 --print-interval 50
run rnd_mc_int10 scripts/ppo_rnd.py --env-id MountainCar-v0 \
  --total-timesteps 1000000 --num-envs 16 --num-steps 128 --int-coef 10.0 \
  --ext-coef 2.0 --seed 1 --print-interval 20
run rnd_mc_int50 scripts/ppo_rnd.py --env-id MountainCar-v0 \
  --total-timesteps 1000000 --num-envs 16 --num-steps 128 --int-coef 50.0 \
  --ext-coef 2.0 --ent-coef 0.01 --seed 1 --print-interval 20
run ppg_sweep tools/tune_ppg_procmaze.py 10
echo "R3 TPU QUEUE2 DONE"
