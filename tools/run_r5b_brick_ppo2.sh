#!/bin/bash
# Round-5 lane B: recurrent PPO's one fair shot at BRICK (verdict item 7).
#
# The standing finding is one-recipe: "PPO can't play BRICK" rests on the
# round-3 recipe (1M steps, num-steps 64 — tools/run_r3n_brick.sh).  This
# lane changes the obvious levers the verdict names: DOUBLE the budget
# (2M) and QUADRUPLE the BPTT window (num-steps 256 — the recurrent
# agent's analog of a deeper frame stack: the LSTM backprops through 256
# env steps of ball/paddle motion instead of 64).  gamma stays 0.99 (it
# already was).  Everything else is the round-3 recipe (32 envs, casl,
# small towers, score rewards, sampled+greedy evals).
#
# Bar: sampled eval > 15 (the scripted tracker's level) upgrades PPO to
# competitive; anything else upgrades the claim to a two-recipe finding.
#
# Launch detached:
#   setsid nohup bash tools/run_r5b_brick_ppo2.sh > runs_mujoco/r5b_lane.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

TOTAL=${BRICK_PPO_TOTAL:-2000000}
LOG=runs_mujoco/brick_ppo2_s1.log
EXP=brick_ppo2

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
    SRC=$(ls -dt saved_agents/brick_native__${EXP}__* 2>/dev/null | head -1)
    if [ -n "${SRC:-}" ]; then
      LOAD="--load-from $SRC"
    else
      echo "=== ledger reset: checkpoint lost, restarting from zero ===" >> "$LOG"
      DONE=0
      REMAIN=$TOTAL
    fi
  fi
  echo "=== segment attempt=$attempt done=$DONE remain=$REMAIN load='${LOAD}' $(date -u +%H:%M:%S) ===" >> "$LOG"
  python -u scripts/brick_ppo.py --host-loop --num-envs 32 --num-steps 256 \
    --total-timesteps "$REMAIN" --num-minibatches 4 --update-epochs 4 \
    --learning-rate 2.5e-4 --target-kl 0.03 --gamma 0.99 \
    --conv-size small --attn-type casl --eval-steps 6000 \
    --save-interval 10 --save-dir saved_agents --print-interval 1 \
    --exp-name "$EXP" --seed 1 $LOAD \
    >> "$LOG" 2>&1
  rc=$?
  SEG=$(awk -F'global_step=' '/^=== segment attempt/{seg=0} /global_step=/{split($2,a," "); seg=a[1]} END{print seg+0}' "$LOG")
  SEG=${SEG:-0}
  echo "=== segment-end attempt=$attempt rc=$rc seg=$SEG $(date -u +%H:%M:%S) ===" >> "$LOG"
  DONE=$((DONE + SEG))
  [ "$rc" -eq 0 ] && break
  sleep 60
done
echo "R5B BRICK-PPO2 LANE DONE done=$DONE"
