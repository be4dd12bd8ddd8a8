#!/bin/bash
# Round-3 lane 11: seed-harden the FIXED-tuner sweep winner at 10M.
# Seed 1 (runs_mujoco/ppg_procmaze800_tuned2.log) scored train 9.20 /
# held-out +1.95, beating the default 3-seed band; seeds 2/3 of the same
# promoted config turn the sweep->promote payoff into a mean±std row.
#
# Chained behind the DT-ROM and C51 lanes: PPG's HBM plan (~9G with the
# int8 aux store) next to the DQN/C51 replay rings (4.2G each) and the
# DT-ROM buffer would exceed the chip's 15.75G, and HBM plans are enforced
# at compile time.
#
# Launch detached:
#   setsid nohup bash tools/run_r3k_ppg_seeds.sh > runs_mujoco/r3k_ppg_lane.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p runs_mujoco
for pidf in /tmp/r3j_dt_rom.pid /tmp/r3i_c51.pid; do
  if [ -f "$pidf" ]; then
    while kill -0 "$(cat "$pidf")" 2>/dev/null; do sleep 60; done
  fi
done
WINNER="--env-id procmaze --num-levels 800 --num-envs 64 \
  --total-timesteps 10000000 --learning-rate 0.000879596697875197 \
  --ent-coef 0.016666666666666666 --e-auxiliary 5 \
  --beta-clone 0.5143478667381387 --n-iteration 32 \
  --num-aux-minibatches 32 --num-minibatches 8 --print-interval 5"
for seed in 2 3; do
  echo "=== ppg_tuned2 seed $seed ==="
  python -u scripts/ppg.py $WINNER --seed $seed --exp-name ppg_tuned2 \
    > "runs_mujoco/ppg_procmaze800_tuned2_s$seed.log" 2>&1
  echo "=== tuned seed $seed rc=$? ==="
done
echo "PPG TUNED SEEDS LANE DONE"
