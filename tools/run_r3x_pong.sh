#!/bin/bash
# Self-play MA PPO on the two-player PONG cartridge (1M slot-steps), then
# match-play evals vs fixed opponents (tools/eval_pong.py).  Gated on the
# TPU round-trip probe (the host loop jits policy+update on the chip);
# one fresh-wait retry like the BRICK chain (no mid-run resume for the
# short 1M budget — a flap costs at most the run so far).
#
# Launch detached:
#   setsid nohup bash tools/run_r3x_pong.sh > runs_mujoco/r3x_lane.log 2>&1 &
#   echo $! > /tmp/r3x.pid
set -u
cd "$(dirname "$0")/.."
mkdir -p runs_mujoco saved_agents

for attempt in 1 2; do
  bash tools/wait_tpu.sh
  echo "=== ppo_ma_pong_s1 attempt $attempt ==="
  python -u scripts/ppo_ma_pong.py --num-envs 16 --num-steps 64 \
    --total-timesteps 1000000 --num-minibatches 4 --update-epochs 4 \
    --learning-rate 2.5e-4 --target-kl 0.03 --gamma 0.99 \
    --conv-size small --attn-type casl --save-interval 40 \
    --save-dir saved_agents --print-interval 4 \
    --exp-name pong_ma_s1 --seed 1 > runs_mujoco/pong_ma_s1.log 2>&1
  rc=$?
  echo "=== ppo_ma_pong_s1 attempt $attempt rc=$rc ==="
  [ "$rc" -eq 0 ] && break
  sleep 60
done

CKPT=$(ls -dt saved_agents/pong_ma_native__pong_ma_s1__* 2>/dev/null | head -1)
if [ -n "${CKPT:-}" ]; then
  for opp in tracker random noop self; do
    echo "=== eval vs $opp ==="
    python -u tools/eval_pong.py --load-from "$CKPT" --opponent "$opp" \
      --num-envs 6 --num-steps 2500 \
      > "runs_mujoco/pong_eval_${opp}.log" 2>&1
    tail -2 "runs_mujoco/pong_eval_${opp}.log"
  done
fi
echo "PONG LANE DONE"
