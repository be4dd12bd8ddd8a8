#!/bin/bash
# Round-4 lane J: C51-BRICK full-budget final, reboot-proof edition.
#
# The 2026-08-19 host reboot wiped saved_agents/ (gitignored), taking the
# 240k resume checkpoint with it — so this is a FRESH 1M-step run.  Unlike
# r4g it keeps its own cumulative budget ledger: each attempt parses the
# steps completed by the previous segment from its own log and asks only
# for the remainder, resuming from the newest checkpoint (saved_agents OR
# the tracked preserve copy runs_mujoco/ckpt_brick_c51, which survives a
# reboot once committed).
#
# Launch detached:
#
# 32-env rescale (21:30Z): same rationale as r4i (53 SPS shared-tunnel
# ceiling); batch 256 per 32-step pool iteration keeps 8 replayed samples
# per env step.  Earlier: C51 target sync
# 1250->625 pool keeps the 10k-global-step cadence.
#   setsid nohup bash tools/run_r4j_c51_brick.sh > runs_mujoco/r4j_lane.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

TOTAL=1000000
LOG=runs_mujoco/c51_brick_f.log
DONE=0
# Recover the ledger from an earlier invocation of this script (post-reboot
# relaunch): sum the last global_step of every completed segment.
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
    SRC=$(ls -dt saved_agents/brick_native__c51_brick_f__* 2>/dev/null | head -1)
    [ -z "${SRC:-}" ] && [ -f runs_mujoco/ckpt_brick_c51/_CHECKPOINT_METADATA ] && SRC=runs_mujoco/ckpt_brick_c51
    [ -n "${SRC:-}" ] && LOAD="--load-from $SRC"
  fi
  echo "=== segment attempt=$attempt done=$DONE remain=$REMAIN load='${LOAD}' $(date -u +%H:%M:%S) ===" >> "$LOG"
  python -u scripts/c51_rom.py --env-id brick_native --num-envs 32 \
    --total-timesteps "$REMAIN" --buffer-size 100000 --batch-size 256 \
    --learning-rate 2.5e-4 --train-frequency 1 --target-network-frequency 313 \
    --learning-starts 20000 --exploration-fraction 0.10 --end-e 0.01 \
    --eval-steps 6000 --print-interval 2 --exp-name c51_brick_f --seed 1 \
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
echo "R4J C51-BRICK LANE DONE done=$DONE"
