#!/bin/bash
# Round-3 TPU-lane restart after the host reboot. In order:
#  1. PPG/ProcMaze sweep (crashed pre-reboot on the since-fixed tuner
#     storage-dir bug), 10 trials at a 2M probe budget.
#  2. Promote the sweep winner to a full 10M run with the held-out eval.
#  3. ProcMaze 800-level seeds 2/3 (seed-harden the generalization row).
#  4. google-variant 12M retry at reference lr (the 6M lr=1e-3 retry
#     finished at the random floor).
#  5. Clean-chip bench + e2e re-measure for BENCH_r03 lockstep.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs_mujoco runs_tuner

python -u tools/tune_ppg_procmaze.py 10 > runs_mujoco/ppg_sweep.log 2>&1
echo "sweep rc=$?"

BEST=$(python - <<'EOF'
import ast
best, score = None, float("-inf")
try:
    for line in open("runs_tuner/ppg_procmaze_study.log"):
        r = ast.literal_eval(line.strip())
        if r["score"] > score:
            best, score = r["params"], r["score"]
except FileNotFoundError:
    pass
if best:
    print(" ".join(f"--{k} {v}" for k, v in best.items()))
EOF
)
echo "promoting sweep winner: $BEST"
if [ -n "$BEST" ]; then
  python -u scripts/ppg.py --env-id procmaze --num-levels 800 --num-envs 64 \
    --total-timesteps 10000000 --num-aux-minibatches 16 $BEST \
    --seed 1 --print-interval 5 > runs_mujoco/ppg_procmaze800_tuned.log 2>&1
  echo "tuned ppg rc=$?"
fi

for seed in 2 3; do
  python -u scripts/ppg.py --env-id procmaze --num-levels 800 --num-envs 64 \
    --total-timesteps 10000000 --seed $seed --print-interval 5 \
    > "runs_mujoco/ppg_procmaze800_s$seed.log" 2>&1
  echo "ppg800 seed$seed rc=$?"
done

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
echo "TPU LANE DONE"
