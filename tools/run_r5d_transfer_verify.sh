#!/bin/bash
# Round-5 lane D: 3-seed 10M verification of the 5M transfer-sweep winner
# (verdict item 4: is the num-levels=400 result real or a single-probe
# fluke?).  Winner = trial 3 of runs_tuner/ppg_transfer_study.log:
# num-levels 400, ent 0.010475, e-aux 7, beta-clone 0.887, n-iter 16, at
# the sweep's fixed lr/env geometry.  10M is the budget at which the
# repo's reference ProcMaze curves are quoted (docs/ppg.md).
#
# Launch detached (after the sweep lane finishes — one device-heavy
# client at a time):
#   setsid nohup bash tools/run_r5d_transfer_verify.sh > runs_mujoco/r5d_lane.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

for seed in 1 2 3; do
  LOG=runs_mujoco/ppg_transfer_winner_10m_s${seed}.log
  if grep -q "test levels: return=" "$LOG" 2>/dev/null; then
    echo "seed $seed already done, skipping"
    continue
  fi
  bash tools/wait_tpu.sh
  echo "=== transfer winner 10M seed=$seed $(date -u +%H:%M:%S) ==="
  python -u scripts/ppg.py --env-id procmaze --num-levels 400 \
    --ent-coef 0.010475268015357952 --e-auxiliary 7 \
    --beta-clone 0.8870053709241579 --n-iteration 16 \
    --learning-rate 8.8e-4 --num-envs 64 --num-steps 64 \
    --num-aux-minibatches 16 --eval-rollout-steps 1024 \
    --total-timesteps 10000000 --print-interval 20 \
    --exp-name transfer_winner_10m --seed "$seed" \
    > "$LOG" 2>&1
  echo "=== seed $seed rc=$? ==="
  tail -3 "$LOG" | grep -v Traceback || true
done
echo "R5D TRANSFER VERIFY DONE"
