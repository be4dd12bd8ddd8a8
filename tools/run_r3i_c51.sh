#!/bin/bash
# Round-3 lane 9: C51 on the RALLY cartridge — the reference's c51_atari
# leg trained on a REAL ROM (scripts/c51_rom.py, host-loop C51 with int8
# device replay; same cadence mapping as the DQN lane for comparability).
# Learning bar (tests/test_rally_rom.py): scripted ball-tracker >=3/episode,
# random ~0 — a greedy eval in/above that band is the learning evidence.
#
# Chained behind the ROM seed-1 lane (/tmp/r3b_rom.pid) so the single host
# core keeps ~3 env-stepping processes.
#
# Launch detached:
#   setsid nohup bash tools/run_r3i_c51.sh > runs_mujoco/r3i_c51_lane.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p runs_mujoco saved_agents
if [ -f /tmp/r3b_rom.pid ]; then
  while kill -0 "$(cat /tmp/r3b_rom.pid)" 2>/dev/null; do sleep 60; done
fi
echo "=== c51_rally_s1: 1M steps, host-loop, native cartridge ==="
python -u scripts/c51_rom.py --total-timesteps 1000000 --num-envs 8 \
  --eval-steps 6000 --print-interval 2 --save-interval 40 \
  --save-dir saved_agents --exp-name c51_rally_s1 --seed 1 \
  > runs_mujoco/c51_rally_s1.log 2>&1
echo "=== c51 rally done rc=$? ==="
echo "C51 LANE DONE"
