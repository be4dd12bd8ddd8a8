#!/bin/bash
# Round-4 lane K: DT-BRICK, value-policy edition.
#
# The r4f DT-BRICK leg needed the sticky-PPO behavior checkpoint, which the
# 2026-08-19 host reboot wiped (gitignored saved_agents/).  The policies
# that DO survive reboots are the C51/DQN finals — their preserve watcher
# copies into tracked paths — so dt_rom.py grew --policy-kind dqn|c51
# (tests/test_dt_rom.py::test_dt_rom_q_behavior) and this lane collects the
# offline dataset from the finished C51-BRICK policy at epsilon 0.1, the
# same protocol as the SkelPlus DT-ROM rows (RESULTS.md).
#
# Waits for the r4j C51 lane to finish.  Target/clip default to the C51
# training band; override via DT_BRICK_TARGET / DT_BRICK_CLIP when the
# final C51 numbers are known.
#
#   setsid nohup bash tools/run_r4k_dt_brick.sh > runs_mujoco/r4k_lane.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

TARGET=${DT_BRICK_TARGET:-45}
CLIP=${DT_BRICK_CLIP:-56}
COLLECT=${DT_BRICK_COLLECT:-65536}
STEPS=${DT_BRICK_STEPS:-15000}
EVAL=${DT_BRICK_EVAL:-51200}

# (marker fixed: r4j prints "R4J C51-BRICK LANE DONE", not "R4J LANE DONE")
while ! grep -q "R4J .*LANE DONE" runs_mujoco/r4j_lane.log 2>/dev/null; do
  sleep 120
done

CKPT=$(ls -dt saved_agents/brick_native__c51_brick_f__* 2>/dev/null | head -1)
[ -z "${CKPT:-}" ] && [ -f runs_mujoco/ckpt_brick_c51/_CHECKPOINT_METADATA ] && CKPT=runs_mujoco/ckpt_brick_c51
if [ -z "${CKPT:-}" ]; then
  echo "no c51_brick_f checkpoint found"; exit 1
fi

for attempt in 1 2 3; do
  bash tools/wait_tpu.sh
  echo "=== dt_brick_c51 attempt $attempt target=$TARGET clip=$CLIP from=$CKPT $(date -u +%H:%M:%S) ==="
  python -u scripts/dt_rom.py --env-id brick_native \
    --policy-from "$CKPT" --policy-kind c51 --policy-epsilon 0.1 \
    --collect-envs 32 --collect-steps "$COLLECT" \
    --total-steps "$STEPS" --batch-size 64 --steps-per-dispatch 30 \
    --target-return "$TARGET" --rtg-clip "$CLIP" \
    --eval-steps "$EVAL" --print-interval 1200 \
    --exp-name dt_brick_c51 --seed 1 \
    >> runs_mujoco/dt_brick_c51.log 2>&1
  rc=$?
  echo "=== dt_brick_c51 attempt $attempt rc=$rc $(date -u +%H:%M:%S) ==="
  [ "$rc" -eq 0 ] && break
  sleep 60
done
echo "R4K LANE DONE"
