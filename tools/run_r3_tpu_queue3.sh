#!/bin/bash
# Round-3 TPU queue phase 3 (after phase 2, /tmp/r3_tpu_queue2.pid):
#   - MA rerun with checkpointing (phase-2 v2 run proved learning at 8M:
#     -3.91 vs measured random floor -10.17, but saved no params for the
#     per-agent eval)
#   - google-variant retry (phase-1 attempt wedged on a remote compile)
set -u
cd "$(dirname "$0")/.."
mkdir -p runs_mujoco
if [ -f /tmp/r3_tpu_queue2.pid ]; then
  while kill -0 "$(cat /tmp/r3_tpu_queue2.pid)" 2>/dev/null; do sleep 60; done
fi
run() {
  name="$1"; shift
  echo "=== $name: $* ==="
  python -u "$@" >"runs_mujoco/$name.log" 2>&1
  echo "=== $name done rc=$? ==="
}
run ma_minecraft_v3 scripts/ppo_ma_minecraft.py --num-envs 16 \
  --total-timesteps 8000000 --clip-rewards False --seed 2 --print-interval 50 \
  --save-interval 200 --save-dir saved_agents
run google_minecraft scripts/minecraft_lstm_google.py \
  --total-timesteps 6000000 --num-envs 16 --num-steps 64 \
  --learning-rate 1e-3 --gamma 0.95 --update-epochs 8 --num-minibatches 4 \
  --clip-rewards False --input-scale 1.0 --seed 1 --print-interval 50
run rnd_minecraft scripts/ppo_rnd.py --env-id minecraft \
  --total-timesteps 1500000 --num-envs 16 --num-steps 128 \
  --clip-rewards False --seed 1 --print-interval 20
echo "R3 TPU QUEUE3 DONE"
