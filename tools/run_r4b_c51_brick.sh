#!/bin/bash
# Round-4 lane B: C51-BRICK to the full 1M budget with a final greedy
# eval (verdict missing #2 — the round-3 run died at 645k/1M at training
# score 40.35 and climbing; reference protocol is full-budget training +
# final eval, c51_atari.py).  Standalone (not chained behind DQN) so both
# value-learning finals run concurrently and finish inside the round.
#
# Launch detached:
#   setsid nohup bash tools/run_r4b_c51_brick.sh > runs_mujoco/r4b_lane.log 2>&1 &
#   echo $! > /tmp/r4b.pid
set -u
cd "$(dirname "$0")/.."
mkdir -p runs_mujoco saved_agents

for attempt in 1 2; do
  bash tools/wait_tpu.sh
  echo "=== c51_brick_s1 attempt $attempt $(date -u +%H:%M:%S) ==="
  python -u scripts/c51_rom.py --env-id brick_native --num-envs 8 \
    --total-timesteps 1000000 --buffer-size 100000 --batch-size 128 \
    --learning-rate 2.5e-4 --train-frequency 2 --target-network-frequency 1250 \
    --learning-starts 20000 --exploration-fraction 0.10 --end-e 0.01 \
    --eval-steps 6000 --print-interval 2 --exp-name c51_brick_s1 --seed 1 --save-interval 100 --save-dir saved_agents \
    >> runs_mujoco/c51_brick_s1.log 2>&1
  rc=$?
  echo "=== c51_brick_s1 attempt $attempt rc=$rc $(date -u +%H:%M:%S) ==="
  [ "$rc" -eq 0 ] && break
  sleep 60
done
echo "R4B LANE DONE"
