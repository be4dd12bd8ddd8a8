#!/bin/bash
# Round-4 lane M: C51-BRICK seed 2 — the n=2 replication of the r4j final
# (NOTES_NEXT_ROUND queued item #3).  Identical 32-env/batch-256 rescale
# protocol (8 replayed samples per env step, see r4i/r4j headers for the
# derivation), differing only in --seed.  Reboot-proof: same cumulative
# budget ledger as r4j, resuming from saved_agents or the tracked
# preserve copy runs_mujoco/ckpt_brick_c51_s2.
#
#   setsid nohup bash tools/run_r4m_c51_brick_s2.sh >> runs_mujoco/r4m_lane.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

TOTAL=1000000
LOG=runs_mujoco/c51_brick_s2.log
DONE=0
if [ -f "$LOG" ]; then
  # A segment header implicitly closes any unterminated previous segment
  # (reboot/kill can strike before the segment-end marker is written).
  DONE=$(awk -F'global_step=' '/^=== segment attempt/{sum+=seg; seg=0} /global_step=/{split($2,a," "); seg=a[1]} /^=== segment-end/{sum+=seg; seg=0} END{print sum+seg}' "$LOG")
  DONE=${DONE:-0}
fi

for attempt in 1 2 3 4 5 6 7 8; do
  REMAIN=$((TOTAL - DONE))
  [ "$REMAIN" -le 0 ] && break
  bash tools/wait_tpu.sh
  LOAD=""
  if [ "$DONE" -gt 0 ]; then
    SRC=$(ls -dt saved_agents/brick_native__c51_brick_s2__* 2>/dev/null | head -1)
    [ -z "${SRC:-}" ] && [ -f runs_mujoco/ckpt_brick_c51_s2/_CHECKPOINT_METADATA ] && SRC=runs_mujoco/ckpt_brick_c51_s2
    [ -n "${SRC:-}" ] && LOAD="--load-from $SRC"
  fi
  echo "=== segment attempt=$attempt done=$DONE remain=$REMAIN load='${LOAD}' $(date -u +%H:%M:%S) ===" >> "$LOG"
  python -u scripts/c51_rom.py --env-id brick_native --num-envs 32 \
    --total-timesteps "$REMAIN" --buffer-size 100000 --batch-size 256 \
    --learning-rate 2.5e-4 --train-frequency 1 --target-network-frequency 313 \
    --learning-starts 20000 --exploration-fraction 0.10 --end-e 0.01 \
    --eval-steps 6000 --print-interval 2 --exp-name c51_brick_s2 --seed 2 \
    --save-interval 25 --save-dir saved_agents $LOAD \
    >> "$LOG" 2>&1
  rc=$?
  # Only count progress printed AFTER the most recent segment header — a
  # zero-progress segment must not re-credit the previous segment's tail.
  SEG=$(awk -F'global_step=' '/^=== segment attempt/{seg=0} /global_step=/{split($2,a," "); seg=a[1]} END{print seg+0}' "$LOG")
  SEG=${SEG:-0}
  echo "=== segment-end attempt=$attempt rc=$rc seg=$SEG $(date -u +%H:%M:%S) ===" >> "$LOG"
  DONE=$((DONE + SEG))
  [ "$rc" -eq 0 ] && break
  sleep 60
done
echo "R4M C51-BRICK-S2 LANE DONE done=$DONE"
