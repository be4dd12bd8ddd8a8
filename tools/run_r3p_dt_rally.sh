#!/bin/bash
# Round-3 lane 16: widen the offline-DT evidence to a SECOND real cartridge.
# dt_rom.py's collect -> train -> return-conditioned-eval pipeline, on RALLY,
# with the round-3 RALLY PPO checkpoint as the behavior policy (greedy score
# 5.78/episode at eps=0; collection runs at eps=0.1).  Raw ALE score-delta
# rewards; target conditions above the dataset mean like the SkelPlus rows.
# Then C51 on BRICK (the Breakout-class leg's distributional row).
#
# Chained behind the BRICK PPO+DQN lane (/tmp/r3n_brick.pid) to keep the
# single host core at <= 3 env-stepping processes.
#
# Launch detached:
#   setsid nohup bash tools/run_r3p_dt_rally.sh > runs_mujoco/r3p_lane.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p runs_mujoco saved_agents
if [ -f /tmp/r3n_brick.pid ]; then
  while kill -0 "$(cat /tmp/r3n_brick.pid)" 2>/dev/null; do sleep 60; done
fi

RALLY_CKPT=$(ls -dt saved_agents/rally_native__rally_ppo_s1__* 2>/dev/null | head -1)
if [ -n "${RALLY_CKPT:-}" ]; then
  echo "=== dt_rally_s1: collect(65k)+train(15k)+eval on the RALLY cartridge ==="
  python -u scripts/dt_rom.py --env-id rally_native \
    --policy-from "$RALLY_CKPT" --policy-epsilon 0.1 \
    --collect-envs 16 --collect-steps 65536 \
    --total-steps 15000 --batch-size 64 --steps-per-dispatch 30 \
    --target-return 12 --rtg-clip 15 \
    --eval-steps 51200 --print-interval 1200 \
    --exp-name dt_rally_s1 --seed 1 > runs_mujoco/dt_rally_s1.log 2>&1
  echo "=== dt rally done rc=$? ==="
else
  echo "no rally_ppo_s1 checkpoint found; skipping DT-RALLY"
fi

echo "=== c51_brick_s1: 1M steps, host-loop C51 on the BRICK cartridge ==="
python -u scripts/c51_rom.py --env-id brick_native --num-envs 8 \
  --total-timesteps 1000000 --buffer-size 100000 --batch-size 128 \
  --learning-rate 2.5e-4 --train-frequency 2 --target-network-frequency 1250 \
  --learning-starts 20000 --exploration-fraction 0.10 --end-e 0.01 \
  --eval-steps 6000 --print-interval 2 --exp-name c51_brick_s1 --seed 1 \
  > runs_mujoco/c51_brick_s1.log 2>&1
echo "=== c51 brick done rc=$? ==="
echo "R3P LANE DONE"
