#!/bin/bash
# Round-5 lane E: DT-RALLY seed 2 (verdict item 6 — the 6.90 row is n=1).
#
# The seed-1 behavior policy (RALLY PPO) died with the 2026-08-19 host
# reboot; the seed-2 dataset comes from the RALLY C51 seed-2 final this
# round's r5a lane trains (--policy-kind c51 at epsilon 0.1 — the same
# value-policy protocol as the DT-BRICK rows).  Target/clip scale off the
# C51 training band; override via DT_RALLY_TARGET / DT_RALLY_CLIP once the
# final C51 s2 number is known.
#
#   setsid nohup bash tools/run_r5e_dt_rally_s2.sh > runs_mujoco/r5e_lane.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

TARGET=${DT_RALLY_TARGET:-18}
CLIP=${DT_RALLY_CLIP:-24}

while ! grep -q "R5A RALLY-c51 SEED-2 LANE DONE" runs_mujoco/r5a_c51_lane.log 2>/dev/null; do
  sleep 120
done

CKPT=$(ls -dt saved_agents/rally_native__c51_rally_s2__* 2>/dev/null | head -1)
if [ -z "${CKPT:-}" ]; then
  echo "no c51_rally_s2 checkpoint found"; exit 1
fi

for attempt in 1 2 3; do
  bash tools/wait_tpu.sh
  echo "=== dt_rally_s2 attempt $attempt target=$TARGET clip=$CLIP from=$CKPT $(date -u +%H:%M:%S) ==="
  python -u scripts/dt_rom.py --env-id rally_native \
    --policy-from "$CKPT" --policy-kind c51 --policy-epsilon 0.1 \
    --collect-envs 32 --collect-steps 65536 \
    --total-steps 15000 --batch-size 64 --steps-per-dispatch 30 \
    --target-return "$TARGET" --rtg-clip "$CLIP" \
    --eval-steps 51200 --print-interval 1200 \
    --exp-name dt_rally_s2 --seed 2 \
    >> runs_mujoco/dt_rally_s2.log 2>&1
  rc=$?
  echo "=== dt_rally_s2 attempt $attempt rc=$rc $(date -u +%H:%M:%S) ==="
  [ "$rc" -eq 0 ] && break
  sleep 60
done
echo "R5E LANE DONE"
