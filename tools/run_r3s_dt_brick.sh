#!/bin/bash
# Round-3 lane 19: offline DT on the THIRD cartridge (BRICK), completing the
# 4-algorithm (PPO/DQN/C51/DT) x 3-cartridge (SkelPlus/RALLY/BRICK) matrix.
# Behavior policy: the BRICK PPO checkpoint acting by SAMPLING (dt_rom.py's
# default) + eps=0.1 — the sampled rule scores 5.99/ep where argmax collapses
# to 0.64 (tools/eval_rom_policy.py; the ALE determinism pathology).
# Raw row-scored brick rewards; target conditions ~2x the dataset mean,
# mirroring the RALLY lane's convention (tools/run_r3p_dt_rally.sh).
#
# Chained behind the r3q pendulum lane to keep the single host core sane.
#
# Launch detached:
#   setsid nohup bash tools/run_r3s_dt_brick.sh > runs_mujoco/r3s_lane.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p runs_mujoco saved_agents
if [ -f /tmp/r3q.pid ]; then
  while kill -0 "$(cat /tmp/r3q.pid)" 2>/dev/null; do sleep 60; done
fi

BRICK_CKPT=$(ls -dt saved_agents/brick_native__brick_ppo_s1__* 2>/dev/null | head -1)
if [ -z "${BRICK_CKPT:-}" ]; then
  echo "no brick_ppo_s1 checkpoint found; aborting DT-BRICK"
  exit 1
fi
echo "=== dt_brick_s1: collect(65k)+train(15k)+eval on the BRICK cartridge ==="
python -u scripts/dt_rom.py --env-id brick_native \
  --policy-from "$BRICK_CKPT" --policy-epsilon 0.1 \
  --collect-envs 16 --collect-steps 65536 \
  --total-steps 15000 --batch-size 64 --steps-per-dispatch 30 \
  --target-return 12 --rtg-clip 16 \
  --eval-steps 51200 --print-interval 1200 \
  --exp-name dt_brick_s1 --seed 1 > runs_mujoco/dt_brick_s1.log 2>&1
echo "=== dt brick done rc=$? ==="
echo "R3S LANE DONE"
