#!/bin/bash
# Relaunch of the BRICK cartridge chain after the tunnel outage:
#   1) C51-BRICK 1M (was killed at 645k with training score 40.35/ep)
#   2) DQN-BRICK 1M (was killed at 454k at ~2.3/ep)
#   3) DT-BRICK offline (never started — backend init died)
# Completes the 4-algorithm x 3-cartridge matrix (PPO/DQN/C51/DT on
# SkelPlus/RALLY/BRICK).  Each job waits for the TPU and gets ONE retry
# after a fresh wait (the off-policy loops have no mid-run resume — a
# flap costs the run, so the retry restarts it rather than losing the
# lane entirely).
#
# Launch detached:
#   setsid nohup bash tools/run_r3u_brick_chain.sh > runs_mujoco/r3u_lane.log 2>&1 &
#   echo $! > /tmp/r3u.pid
set -u
cd "$(dirname "$0")/.."
mkdir -p runs_mujoco saved_agents

run_job() {  # run_job <name> <cmd...>
  local name=$1; shift
  for attempt in 1 2; do
    bash tools/wait_tpu.sh
    echo "=== $name attempt $attempt ==="
    "$@" > "runs_mujoco/$name.log" 2>&1
    local rc=$?
    echo "=== $name attempt $attempt rc=$rc ==="
    [ "$rc" -eq 0 ] && return 0
    sleep 60
  done
  return 1
}

run_job c51_brick_s1 \
  python -u scripts/c51_rom.py --env-id brick_native --num-envs 8 \
  --total-timesteps 1000000 --buffer-size 100000 --batch-size 128 \
  --learning-rate 2.5e-4 --train-frequency 2 --target-network-frequency 1250 \
  --learning-starts 20000 --exploration-fraction 0.10 --end-e 0.01 \
  --eval-steps 6000 --print-interval 2 --exp-name c51_brick_s1 --seed 1

run_job dqn_brick_s1 \
  python -u scripts/dqn_rom.py --env-id brick_native --num-envs 8 \
  --total-timesteps 1000000 --buffer-size 100000 --batch-size 128 \
  --learning-rate 1e-4 --train-frequency 2 --target-network-frequency 125 \
  --learning-starts 20000 --exploration-fraction 0.10 --end-e 0.01 \
  --eval-steps 6000 --print-interval 1 --exp-name dqn_brick_s1 --seed 1

BRICK_CKPT=$(ls -dt saved_agents/brick_native__brick_ppo_s1__* 2>/dev/null | head -1)
if [ -z "${BRICK_CKPT:-}" ]; then
  echo "no brick_ppo_s1 checkpoint found; skipping DT-BRICK"
else
  run_job dt_brick_s1 \
    python -u scripts/dt_rom.py --env-id brick_native \
    --policy-from "$BRICK_CKPT" --policy-epsilon 0.1 \
    --collect-envs 16 --collect-steps 65536 \
    --total-steps 15000 --batch-size 64 --steps-per-dispatch 30 \
    --target-return 12 --rtg-clip 16 \
    --eval-steps 51200 --print-interval 1200 \
    --exp-name dt_brick_s1 --seed 1
fi
echo "R3U LANE DONE"
