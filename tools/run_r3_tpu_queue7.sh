#!/bin/bash
# Round-3 TPU queue phase 7, chained behind phase 5: seed-harden the
# ProcMaze 800-level PPG generalization row (seed 1: train 8.27 /
# held-out +1.96, RESULTS.md).
set -u
cd "$(dirname "$0")/.."
if [ -f /tmp/r3_tpu_queue5.pid ]; then
  while kill -0 "$(cat /tmp/r3_tpu_queue5.pid)" 2>/dev/null; do sleep 60; done
fi
for seed in 2 3; do
  python -u scripts/ppg.py --env-id procmaze --num-levels 800 --num-envs 64 \
    --total-timesteps 10000000 --seed $seed --print-interval 5 \
    > "runs_mujoco/ppg_procmaze800_s$seed.log" 2>&1
  echo "ppg800 seed$seed rc=$?"
done
echo "TPU QUEUE7 DONE"
