#!/bin/bash
# Round-3 lane 14: learning rows on BRICK, the in-repo Breakout-class
# cartridge (native/homebrew/brick.asm).  The reference's Atari leg names
# Breakout (cleanrl dqn_atari/ppo_atari docs); BRICK supplies its task
# structure on a real emulated cartridge.  Scripted tracker >= 10/episode,
# random ~0-2 (tests/test_brick_rom.py) — a greedy eval above that band is
# the learning evidence.
#
# 1) PPO 1M (same recipe as the RALLY PPO headline lane, now with the
#    raw-ALE-delta reward after the hostloop mirror fix).
# 2) DQN 1M (host-loop DQN, same cadence as the RALLY/ROM DQN lanes).
#
# Launch detached:
#   setsid nohup bash tools/run_r3n_brick.sh > runs_mujoco/r3n_brick_lane.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p runs_mujoco saved_agents

echo "=== brick_ppo_s1: 1M steps, host-loop, native cartridge ==="
python -u scripts/brick_ppo.py --host-loop --num-envs 32 --num-steps 64 \
  --total-timesteps 1000000 --num-minibatches 4 --update-epochs 4 \
  --learning-rate 2.5e-4 --target-kl 0.03 --gamma 0.99 \
  --conv-size small --attn-type casl --save-interval 40 \
  --save-dir saved_agents --eval-steps 4000 --print-interval 4 \
  --exp-name brick_ppo_s1 --seed 1 > runs_mujoco/brick_ppo_s1.log 2>&1
echo "=== brick ppo done rc=$? ==="

echo "=== dqn_brick_s1: 1M steps, host-loop DQN ==="
python -u scripts/dqn_rom.py --env-id brick_native --num-envs 8 \
  --total-timesteps 1000000 --buffer-size 100000 --batch-size 128 \
  --learning-rate 1e-4 --train-frequency 2 --target-network-frequency 125 \
  --learning-starts 20000 --exploration-fraction 0.10 --end-e 0.01 \
  --eval-steps 6000 --print-interval 1 --exp-name dqn_brick_s1 --seed 1 \
  > runs_mujoco/dqn_brick_s1.log 2>&1
echo "=== brick dqn done rc=$? ==="
echo "BRICK LANE DONE"
