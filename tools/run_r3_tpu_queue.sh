#!/bin/bash
# Round-3 TPU device-env evidence runs (VERDICT missing #5/#6, weak #6):
# sequential to avoid piling onto the chip next to the ROM/SAC host-loops.
#   1) RND on MountainCar-v0 (canonical exploration showcase: plain PPO
#      flatlines at -200; reference treats RND as headline, ppo_rnd_envpool.py)
#   2) MA param-sharing PPO on minecraft2d_ma to a learned return
#   3) google-variant agent (minecraft_lstm_google.py) to a learned return
set -u
cd "$(dirname "$0")/.."
mkdir -p runs_mujoco
run() {
  name="$1"; shift
  echo "=== $name: $* ==="
  python -u "$@" >"runs_mujoco/$name.log" 2>&1
  echo "=== $name done rc=$? ==="
}
run rnd_mountaincar_s1 scripts/ppo_rnd.py --env-id MountainCar-v0 \
  --total-timesteps 1000000 --num-envs 16 --num-steps 128 --seed 1 \
  --print-interval 20
run rnd_mountaincar_s2 scripts/ppo_rnd.py --env-id MountainCar-v0 \
  --total-timesteps 1000000 --num-envs 16 --num-steps 128 --seed 2 \
  --print-interval 20
run ma_minecraft scripts/ppo_ma_minecraft.py --num-envs 16 \
  --total-timesteps 4000000 --learning-rate 1e-3 --gamma 0.95 \
  --update-epochs 8 --num-minibatches 4 --clip-rewards False --seed 1 \
  --print-interval 50
run google_minecraft scripts/minecraft_lstm_google.py \
  --total-timesteps 6000000 --num-envs 16 --num-steps 64 \
  --learning-rate 1e-3 --gamma 0.95 --update-epochs 8 --num-minibatches 4 \
  --clip-rewards False --input-scale 1.0 --seed 1 --print-interval 50
echo "R3 TPU QUEUE DONE"
