#!/bin/bash
# Round-5 lane A: seed-2 for the n=1 RALLY value rows (verdict item 6).
#
#   bash tools/run_r5a_rally_s2.sh dqn   -> scripts/dqn_rom.py seed 2
#   bash tools/run_r5a_rally_s2.sh c51   -> scripts/c51_rom.py seed 2
#
# 32-env rescale with the reference cadence ratios preserved exactly, the
# same mapping the round-4 BRICK finals used (tools/run_r4i header): 8
# replayed samples per env transition (batch 256 / train-freq 1 / 32 envs
# vs the 8-env default's batch 128 / train-freq 2), target sync at the
# same transition count (DQN: 1000 -> 32 pool steps; C51: 10000 -> 313).
# Seed-1 rows ran the 8-env defaults (runs_mujoco/{dqn,c51}_rally_s1.log);
# the rescale is throughput-only — per-transition statistics identical.
#
# Reboot-proof ledger (r4i pattern), except: if the checkpoint is gone
# (host reboot wipes gitignored saved_agents/), the ledger RESETS and the
# run restarts from zero — a cold net continuing a counted budget would
# corrupt the row.  Launch detached:
#   setsid nohup bash tools/run_r5a_rally_s2.sh dqn > runs_mujoco/r5a_dqn_lane.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

ALGO=${1:?usage: run_r5a_rally_s2.sh dqn|c51}
TOTAL=${RALLY_TOTAL:-1000000}
LOG=runs_mujoco/${ALGO}_rally_s2.log
EXP=${ALGO}_rally_s2
if [ "$ALGO" = dqn ]; then
  TARGET_FREQ=32
else
  TARGET_FREQ=313
fi

DONE=0
if [ -f "$LOG" ]; then
  DONE=$(awk -F'global_step=' '/^=== segment attempt/{sum+=seg; seg=0} /global_step=/{split($2,a," "); seg=a[1]} /^=== segment-end/{sum+=seg; seg=0} END{print sum+seg}' "$LOG")
  DONE=${DONE:-0}
fi

for attempt in 1 2 3 4 5 6; do
  REMAIN=$((TOTAL - DONE))
  [ "$REMAIN" -le 0 ] && break
  bash tools/wait_tpu.sh
  LOAD=""
  if [ "$DONE" -gt 0 ]; then
    SRC=$(ls -dt saved_agents/rally_native__${EXP}__* 2>/dev/null | head -1)
    if [ -n "${SRC:-}" ]; then
      LOAD="--load-from $SRC"
    else
      echo "=== ledger reset: checkpoint lost, restarting from zero ===" >> "$LOG"
      DONE=0
      REMAIN=$TOTAL
    fi
  fi
  echo "=== segment attempt=$attempt done=$DONE remain=$REMAIN load='${LOAD}' $(date -u +%H:%M:%S) ===" >> "$LOG"
  python -u scripts/${ALGO}_rom.py --env-id rally_native --num-envs 32 \
    --total-timesteps "$REMAIN" --buffer-size 100000 --batch-size 256 \
    --train-frequency 1 --target-network-frequency "$TARGET_FREQ" \
    --learning-starts 20000 --exploration-fraction 0.10 --end-e 0.01 \
    --eval-steps 6000 --print-interval 1 --exp-name "$EXP" --seed 2 \
    --save-interval 25 --save-dir saved_agents $LOAD \
    >> "$LOG" 2>&1
  rc=$?
  SEG=$(awk -F'global_step=' '/^=== segment attempt/{seg=0} /global_step=/{split($2,a," "); seg=a[1]} END{print seg+0}' "$LOG")
  SEG=${SEG:-0}
  echo "=== segment-end attempt=$attempt rc=$rc seg=$SEG $(date -u +%H:%M:%S) ===" >> "$LOG"
  DONE=$((DONE + SEG))
  [ "$rc" -eq 0 ] && break
  sleep 60
done
echo "R5A RALLY-${ALGO} SEED-2 LANE DONE done=$DONE"
