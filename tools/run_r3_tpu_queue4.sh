#!/bin/bash
# Round-3 TPU queue phase 4, chained behind the ROM Skeleton+ resume
# (pid file /tmp/skel_rom_hl4.pid; falls back to waiting on any
# skeleton_plus_ppo.py pid recorded there). Contents:
#   1) PPG/ProcMaze hyperparameter sweep (tuner storage-dir bug fixed).
#   2) google-variant Minecraft2d retry at the reference-default LR
#      (the 6M lr=1e-3 run plateaued at ~-11 vs random -16.1).
#   3) Clean-chip DT benches (step-only + end-to-end) once the TPU is free.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs_mujoco runs_tuner
if [ -f /tmp/skel_rom_hl4.pid ]; then
  while kill -0 "$(cat /tmp/skel_rom_hl4.pid)" 2>/dev/null; do sleep 60; done
fi
python -u tools/tune_ppg_procmaze.py 10 > runs_mujoco/ppg_sweep.log 2>&1
echo "sweep rc=$?"
python -u scripts/minecraft_lstm_google.py --total-timesteps 12000000 \
  --num-envs 16 --num-steps 64 --learning-rate 2.5e-4 --gamma 0.95 \
  --update-epochs 4 --num-minibatches 4 --clip-rewards False \
  --input-scale 1.0 --seed 1 --print-interval 50 \
  > runs_mujoco/google_minecraft2.log 2>&1
echo "google2 rc=$?"
python -u bench.py > runs_mujoco/bench_r3_clean.log 2>&1
echo "bench rc=$?"
python -u tools/bench_dt_e2e.py > runs_mujoco/bench_r3_e2e.log 2>&1
echo "e2e rc=$?"
echo "TPU QUEUE4 DONE"
