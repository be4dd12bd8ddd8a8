#!/bin/bash
# Round-4 lane H: C51-BRICK fresh 1M (the 18:00 tunnel seizure killed the
# first relaunch before any step; run concurrently with the DQN resume
# lane — two host-loop clients was this morning's stable load).
#   setsid nohup bash tools/run_r4h_c51_brick.sh > runs_mujoco/r4h_lane.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

for attempt in 1 2 3; do
  bash tools/wait_tpu.sh
  echo "=== c51_brick_s1 attempt $attempt $(date -u +%H:%M:%S) ==="
  LOAD=$(ls -dt saved_agents/brick_native__c51_brick_s1b__* 2>/dev/null | head -1)
  EXTRA=""
  [ -n "${LOAD:-}" ] && EXTRA="--load-from $LOAD"
  python -u scripts/c51_rom.py --env-id brick_native --num-envs 8 \
    --total-timesteps 1000000 --buffer-size 100000 --batch-size 128 \
    --learning-rate 2.5e-4 --train-frequency 2 --target-network-frequency 1250 \
    --learning-starts 20000 --exploration-fraction 0.10 --end-e 0.01 \
    --eval-steps 6000 --print-interval 2 --exp-name c51_brick_s1b --seed 1 \
    --save-interval 100 --save-dir saved_agents $EXTRA \
    >> runs_mujoco/c51_brick_s1.log 2>&1
  rc=$?
  echo "=== c51_brick_s1 attempt $attempt rc=$rc $(date -u +%H:%M:%S) ==="
  [ "$rc" -eq 0 ] && break
  sleep 60
done
echo "R4H LANE DONE"
