#!/bin/bash
# Round-4 lane C: DQN-BRICK to the full 1M budget with a final greedy
# eval (verdict missing #2 — round-3 run outage-killed at 454k/1M at
# ~2.2/ep; reference protocol dqn_atari.py).  Runs concurrently with the
# C51 lane (tunnel round-trips overlap on the single host core).
#
# Launch detached:
#   setsid nohup bash tools/run_r4c_dqn_brick.sh > runs_mujoco/r4c_lane.log 2>&1 &
#   echo $! > /tmp/r4c.pid
set -u
cd "$(dirname "$0")/.."
mkdir -p runs_mujoco saved_agents

for attempt in 1 2; do
  bash tools/wait_tpu.sh
  echo "=== dqn_brick_s1 attempt $attempt $(date -u +%H:%M:%S) ==="
  python -u scripts/dqn_rom.py --env-id brick_native --num-envs 8 \
    --total-timesteps 1000000 --buffer-size 100000 --batch-size 128 \
    --learning-rate 1e-4 --train-frequency 2 --target-network-frequency 125 \
    --learning-starts 20000 --exploration-fraction 0.10 --end-e 0.01 \
    --eval-steps 6000 --print-interval 1 --exp-name dqn_brick_s1 --seed 1 \
    --save-interval 100 --save-dir saved_agents \
    >> runs_mujoco/dqn_brick_s1.log 2>&1
  rc=$?
  echo "=== dqn_brick_s1 attempt $attempt rc=$rc $(date -u +%H:%M:%S) ==="
  [ "$rc" -eq 0 ] && break
  sleep 60
done
echo "R4C LANE DONE"
