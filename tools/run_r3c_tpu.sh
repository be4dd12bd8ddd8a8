#!/bin/bash
# TPU-lane follow-up, chained behind tools/run_r3b_tpu.sh (pid in
# /tmp/r3b_tpu.pid).  Fixes two defects found in the r3b queue:
#   - the ProcMaze 800-level seed 2/3 runs were queued with
#     --num-aux-minibatches 16 + default lr/minibatches, which is NOT the
#     seed-1 row's config (num-aux-minibatches 32, num-minibatches 8,
#     lr 5e-4) and whose compile-time HBM plan (16.01G) OOMs a 16G v5e.
#     Re-run with the exact seed-1 argv (runs_manifest.jsonl) — now also
#     under the int8 aux store (exact for procmaze's {-1,+1} planes).
#   - the PPG sweep's metric read-back raced concurrent runs in runs/
#     (tuner -inf bug, fixed via MMTRL_RUN_ROOT) and the study crashed on
#     accumulated device state after 5 trials (fixed via jax.clear_caches
#     per trial).
# Order is end-of-round aware: seed-hardening first, then promote the
# measured winner of the r3b study (trial 0, score 0.187 — best of the
# 2M-probe trials that scored; runs_mujoco/ppg_sweep.log), and only then
# a clean re-run of the study with the fixed tuner.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs_mujoco runs_tuner
if [ -f /tmp/r3b_tpu.pid ]; then
  while kill -0 "$(cat /tmp/r3b_tpu.pid)" 2>/dev/null; do sleep 60; done
fi

SEED1_ARGS="--env-id procmaze --num-levels 800 --total-timesteps 10000000 \
  --num-envs 64 --num-steps 64 --num-aux-minibatches 32 --num-minibatches 8 \
  --learning-rate 5e-4 --print-interval 5"
for seed in 2 3; do
  python -u scripts/ppg.py $SEED1_ARGS --seed $seed \
    > "runs_mujoco/ppg_procmaze800_s$seed.log" 2>&1
  echo "ppg800 seed$seed rc=$?"
done

# r3b study winner (runs_tuner/ppg_procmaze_study.log trial 0), promoted
# to the full 10M budget with the held-out [800,1000) eval.
python -u scripts/ppg.py --env-id procmaze --num-levels 800 --num-envs 64 \
  --total-timesteps 10000000 \
  --learning-rate 0.0003464101615137754 --ent-coef 0.01 \
  --e-auxiliary 4 --beta-clone 0.6095068271022377 \
  --n-iteration 16 --num-aux-minibatches 16 \
  --seed 1 --print-interval 5 > runs_mujoco/ppg_procmaze800_tuned.log 2>&1
echo "tuned ppg rc=$?"

rm -f runs_tuner/ppg_procmaze_study.log
python -u tools/tune_ppg_procmaze.py 10 > runs_mujoco/ppg_sweep2.log 2>&1
echo "sweep rc=$?"
echo "TPU LANE 3C DONE"
