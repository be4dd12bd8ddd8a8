#!/bin/bash
# Round-4 lane G: BRICK value-learning finals, resume edition.
# The 18:00 tunnel seizure (five concurrent TPU clients) killed both the
# DQN lane (hung at 248k, checkpoint at 240k thanks to --save-interval)
# and the freshly-relaunched C51 lane (no steps yet).  This chain:
#   1) resumes DQN from its checkpoint for the remaining 760k budget
#      (hostloop resume semantics: cold ring refill at end_e) + greedy eval
#   2) then C51 fresh to 1M + greedy eval (serialized: two host-loop
#      clients max alongside the r4f DT lane).
#
# Launch detached:
#   setsid nohup bash tools/run_r4g_brick_resume.sh > runs_mujoco/r4g_lane.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

DQN_CKPT=$(ls -dt saved_agents/brick_native__dqn_brick_s1__* 2>/dev/null | head -1)

if [ -n "${DQN_CKPT:-}" ]; then
  for attempt in 1 2 3; do
    bash tools/wait_tpu.sh
    echo "=== dqn_brick_s1_resume attempt $attempt $(date -u +%H:%M:%S) from $DQN_CKPT ==="
    python -u scripts/dqn_rom.py --env-id brick_native --num-envs 8 \
      --total-timesteps 760000 --buffer-size 100000 --batch-size 128 \
      --learning-rate 1e-4 --train-frequency 2 --target-network-frequency 125 \
      --learning-starts 20000 --exploration-fraction 0.10 --end-e 0.01 \
      --eval-steps 6000 --print-interval 1 --exp-name dqn_brick_s1r --seed 1 \
      --save-interval 100 --save-dir saved_agents --load-from "$DQN_CKPT" \
      >> runs_mujoco/dqn_brick_s1.log 2>&1
    rc=$?
    echo "=== dqn_brick_s1_resume attempt $attempt rc=$rc $(date -u +%H:%M:%S) ==="
    [ "$rc" -eq 0 ] && break
    # on failure, resume from the NEWEST checkpoint (this run's if it saved)
    DQN_CKPT=$(ls -dt saved_agents/brick_native__dqn_brick_s1* 2>/dev/null | head -1)
    sleep 60
  done
fi
echo "R4G LANE DONE"
