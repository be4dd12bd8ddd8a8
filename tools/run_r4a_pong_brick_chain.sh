#!/bin/bash
# Round-4 lane A: the three never-ran legs chained on one host-loop slot.
#   1) PONG 2-player self-play MA PPO 1M + match evals (verdict missing #1
#      — the committed capability with zero training evidence; anchor
#      reference ppo_pettingzoo_ma_atari.py:150-159)
#   2) BRICK PPO retrained WITH sticky actions during training
#      (--repeat-action-probability 0.25, the reference's envpool v5
#      convention, ppo_rnd_envpool.py:281) — settles whether round-3's
#      greedy collapse (0.62 deterministic) was policy or protocol, and
#      regenerates the PPO checkpoint the reboot wiped.
#   3) DT-BRICK offline from that checkpoint (the chain leg that never
#      started in round 3 — backend init died).
# Each job gates on the TPU round-trip probe with one fresh-wait retry.
#
# Launch detached:
#   setsid nohup bash tools/run_r4a_pong_brick_chain.sh > runs_mujoco/r4a_lane.log 2>&1 &
#   echo $! > /tmp/r4a.pid
set -u
cd "$(dirname "$0")/.."
mkdir -p runs_mujoco saved_agents

run_job() {  # run_job <name> <cmd...>
  local name=$1; shift
  for attempt in 1 2; do
    bash tools/wait_tpu.sh
    echo "=== $name attempt $attempt $(date -u +%H:%M:%S) ==="
    "$@" >> "runs_mujoco/$name.log" 2>&1
    local rc=$?
    echo "=== $name attempt $attempt rc=$rc $(date -u +%H:%M:%S) ==="
    [ "$rc" -eq 0 ] && return 0
    sleep 60
  done
  return 1
}

# --- 1) PONG MA self-play -------------------------------------------------
run_job pong_ma_s1 \
  python -u scripts/ppo_ma_pong.py --num-envs 16 --num-steps 64 \
  --total-timesteps 1000000 --num-minibatches 4 --update-epochs 4 \
  --learning-rate 2.5e-4 --target-kl 0.03 --gamma 0.99 \
  --conv-size small --attn-type casl --save-interval 40 \
  --save-dir saved_agents --print-interval 4 \
  --exp-name pong_ma_s1 --seed 1

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

# --- 2) BRICK PPO with training-time sticky actions -----------------------
run_job brick_ppo_sticky_s1 \
  python -u scripts/brick_ppo.py --host-loop --num-envs 32 \
  --total-timesteps 1000000 --repeat-action-probability 0.25 \
  --save-interval 40 --save-dir saved_agents --print-interval 4 \
  --eval-steps 16000 --exp-name brick_ppo_sticky_s1 --seed 1

# --- 3) DT-BRICK offline from the sticky checkpoint -----------------------
BRICK_CKPT=$(ls -dt saved_agents/brick_native__brick_ppo_sticky_s1__* 2>/dev/null | head -1)
if [ -z "${BRICK_CKPT:-}" ]; then
  echo "no brick_ppo_sticky_s1 checkpoint found; skipping DT-BRICK"
else
  run_job dt_brick_s1 \
    python -u scripts/dt_rom.py --env-id brick_native \
    --policy-from "$BRICK_CKPT" --policy-epsilon 0.1 \
    --collect-envs 16 --collect-steps 65536 \
    --total-steps 15000 --batch-size 64 --steps-per-dispatch 30 \
    --target-return 12 --rtg-clip 16 \
    --eval-steps 51200 --print-interval 1200 \
    --exp-name dt_brick_s1 --seed 1
fi
echo "R4A LANE DONE"
