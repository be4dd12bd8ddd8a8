#!/bin/bash
# Round-3 lane 18: relaunch of the dead r3n lane's SECOND job (the r3n
# wrapper died after starting BRICK PPO, so DQN-BRICK never launched).
# Host-loop DQN on the Breakout-class brick.bin — the dqn_atari leg's
# value-based row on the Breakout-analog cartridge (scripted tracker >=10,
# random ~0-2, tests/test_brick_rom.py).  Chained behind the r3g 4M reacher
# lane to keep the single host core at <= 4 env-stepping processes.
#
# Launch detached:
#   setsid nohup bash tools/run_r3r_dqn_brick.sh > runs_mujoco/r3r_lane.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p runs_mujoco saved_agents
if [ -f /tmp/r3g_rpo4m.pid ]; then
  while kill -0 "$(cat /tmp/r3g_rpo4m.pid)" 2>/dev/null; do sleep 60; done
fi
echo "=== dqn_brick_s1: 1M steps, host-loop DQN ==="
python -u scripts/dqn_rom.py --env-id brick_native --num-envs 8 \
  --total-timesteps 1000000 --buffer-size 100000 --batch-size 128 \
  --learning-rate 1e-4 --train-frequency 2 --target-network-frequency 125 \
  --learning-starts 20000 --exploration-fraction 0.10 --end-e 0.01 \
  --eval-steps 6000 --print-interval 1 --exp-name dqn_brick_s1 --seed 1 \
  > runs_mujoco/dqn_brick_s1.log 2>&1
echo "=== brick dqn done rc=$? ==="
echo "R3R LANE DONE"
