#!/bin/bash
# Round-5 lane C: retrain PONG self-play and WIDEN the match evals
# (verdict item 6: the round-4 headline vs the tracker was 6 matches; the
# checkpoint died with the host reboot — gitignored saved_agents/ — so the
# policy retrains with the identical round-4 recipe, then every opponent
# eval runs >= 30 matches).
#
# Launch detached:
#   setsid nohup bash tools/run_r5c_pong.sh > runs_mujoco/r5c_lane.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

TOTAL=${PONG_TOTAL:-1000000}
LOG=runs_mujoco/pong_ma_s2.log
EXP=pong_ma_s2
# Host RSS grows ~1 MB per pool iteration while a lane runs over the axon
# tunnel (client-side buffering, measured round 5 — the native env and the
# CPU-backend loop are clean), and a wedged client balloons unboundedly
# during tunnel outages (61->114 GB in 20 min killed the round-5 BRICK
# segment).  Recycle the python process every SEGMENT steps so RSS stays
# bounded; the ledger + checkpoint resume make this free.
SEGMENT=${PONG_SEGMENT:-400000}

DONE=0
if [ -f "$LOG" ]; then
  DONE=$(awk -F'global_step=' '/^=== segment attempt/{sum+=seg; seg=0} /global_step=/{split($2,a," "); seg=a[1]} /^=== segment-end/{sum+=seg; seg=0} END{print sum+seg}' "$LOG")
  DONE=${DONE:-0}
fi

for attempt in 1 2 3 4 5 6 7 8 9 10; do
  REMAIN=$((TOTAL - DONE))
  [ "$REMAIN" -le 0 ] && break
  [ "$REMAIN" -gt "$SEGMENT" ] && REMAIN=$SEGMENT
  bash tools/wait_tpu.sh
  LOAD=""
  if [ "$DONE" -gt 0 ]; then
    SRC=$(ls -dt saved_agents/pong_ma_native__${EXP}__* 2>/dev/null | head -1)
    if [ -n "${SRC:-}" ]; then
      LOAD="--load-from $SRC"
    else
      echo "=== ledger reset: checkpoint lost, restarting from zero ===" >> "$LOG"
      DONE=0
      REMAIN=$TOTAL
    fi
  fi
  echo "=== segment attempt=$attempt done=$DONE remain=$REMAIN load='${LOAD}' $(date -u +%H:%M:%S) ===" >> "$LOG"
  # The round-4 recipe verbatim (tools/run_r4a_pong_brick_chain.sh) at a
  # fresh seed.
  python -u scripts/ppo_ma_pong.py --num-envs 16 --num-steps 64 \
    --total-timesteps "$REMAIN" --num-minibatches 4 --update-epochs 4 \
    --learning-rate 2.5e-4 --target-kl 0.03 --gamma 0.99 \
    --conv-size small --attn-type casl --save-interval 40 \
    --save-dir saved_agents --print-interval 4 \
    --exp-name "$EXP" --seed 2 $LOAD \
    >> "$LOG" 2>&1
  rc=$?
  SEG=$(awk -F'global_step=' '/^=== segment attempt/{seg=0} /global_step=/{split($2,a," "); seg=a[1]} END{print seg+0}' "$LOG")
  SEG=${SEG:-0}
  echo "=== segment-end attempt=$attempt rc=$rc seg=$SEG $(date -u +%H:%M:%S) ===" >> "$LOG"
  DONE=$((DONE + SEG))
  # rc==0 ends a capped segment, not the run: loop until DONE >= TOTAL.
  [ "$rc" -ne 0 ] && sleep 60
done
echo "R5C PONG TRAIN DONE done=$DONE"

CKPT=$(ls -dt saved_agents/pong_ma_native__${EXP}__* 2>/dev/null | head -1)
if [ -n "${CKPT:-}" ]; then
  # >= 30 matches per opponent: 8 parallel matches x 12000 steps at the
  # 1500-step episode cap = up to 64 completed matches each.
  for opp in tracker random noop self; do
    echo "=== eval vs $opp (wide) ==="
    python -u tools/eval_pong.py --load-from "$CKPT" --opponent "$opp" \
      --num-envs 8 --num-steps 12000 \
      > "runs_mujoco/pong_eval_${opp}_wide.log" 2>&1
    tail -2 "runs_mujoco/pong_eval_${opp}_wide.log"
  done
fi
echo "R5C PONG LANE DONE"
