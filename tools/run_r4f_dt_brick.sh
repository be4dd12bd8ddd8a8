#!/bin/bash
# Round-4 lane F: the DT-BRICK chain leg, relaunched with the behavior
# agent's ACTUAL architecture (brick_ppo trains the default "big" conv
# tower; dt_rom's --policy-conv-size defaults to "small" — the r4a chain
# failed on the param-shape mismatch), plus the sampled+greedy eval of the
# sticky-trained checkpoint (round-3 comparison row: sampled 5.99 / greedy
# 0.64 on the deterministic-trained policy).
#
# Launch detached:
#   setsid nohup bash tools/run_r4f_dt_brick.sh > runs_mujoco/r4f_lane.log 2>&1 &
#   echo $! > /tmp/r4f.pid
set -u
cd "$(dirname "$0")/.."

BRICK_CKPT=$(ls -dt saved_agents/brick_native__brick_ppo_sticky_s1__* 2>/dev/null | head -1)
if [ -z "${BRICK_CKPT:-}" ]; then
  echo "no brick_ppo_sticky_s1 checkpoint found"; exit 1
fi

bash tools/wait_tpu.sh
echo "=== eval_sticky_ckpt $(date -u +%H:%M:%S) ==="
python -u tools/eval_rom_policy.py --load-from "$BRICK_CKPT" \
  --env-id brick_native --conv-size big --attn-type casl \
  --num-envs 16 --num-steps 6000 --repeat-action-probability 0.25 \
  >> runs_mujoco/brick_sticky_eval.log 2>&1
tail -3 runs_mujoco/brick_sticky_eval.log

for attempt in 1 2; do
  bash tools/wait_tpu.sh
  echo "=== dt_brick_s1 attempt $attempt $(date -u +%H:%M:%S) ==="
  python -u scripts/dt_rom.py --env-id brick_native \
    --policy-from "$BRICK_CKPT" --policy-epsilon 0.1 \
    --policy-conv-size big \
    --collect-envs 16 --collect-steps 65536 \
    --total-steps 15000 --batch-size 64 --steps-per-dispatch 30 \
    --target-return 12 --rtg-clip 16 \
    --eval-steps 51200 --print-interval 1200 \
    --exp-name dt_brick_s1 --seed 1 \
    >> runs_mujoco/dt_brick_s1.log 2>&1
  rc=$?
  echo "=== dt_brick_s1 attempt $attempt rc=$rc $(date -u +%H:%M:%S) ==="
  [ "$rc" -eq 0 ] && break
  sleep 60
done
echo "R4F LANE DONE"
