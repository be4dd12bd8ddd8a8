#!/bin/bash
# Round-3 lane 5: first LEARNING row for the homebrew RALLY cartridge.
# Chained behind the r3d MuJoCo lane (DDPG Walker2d seed 2) so the single
# host core never runs more than ~3 env-stepping processes at once
# (concurrent: ROM skel_rom_hl5 lane + the tail of the rpo_bic lane).
#
# RALLY (native/homebrew/rally.asm, assembled in-repo) is the second real
# cartridge on the native 2600 core. Scripted ball-tracker policy scores
# >=3 per episode, random ~0 (tests/test_rally_rom.py) — a PPO run that
# lands in that range or above converts the cartridge from component to
# measured evidence (COVERAGE.md §2.2 ppo_atari row).
#
# Launch detached:
#   setsid nohup bash tools/run_r3e_rally.sh > runs_mujoco/r3e_rally_lane.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p runs_mujoco
if [ -f /tmp/r3d_mujoco.pid ]; then
  while kill -0 "$(cat /tmp/r3d_mujoco.pid)" 2>/dev/null; do sleep 60; done
fi
echo "=== rally_ppo_s1: 1M steps, host-loop, native cartridge ==="
python -u scripts/rally_ppo.py --host-loop --num-envs 32 --num-steps 64 \
  --total-timesteps 1000000 --num-minibatches 4 --update-epochs 4 \
  --learning-rate 2.5e-4 --target-kl 0.03 --gamma 0.99 \
  --conv-size small --attn-type casl --save-interval 40 \
  --save-dir saved_agents --eval-steps 4000 --print-interval 4 \
  --exp-name rally_ppo_s1 --seed 1 > runs_mujoco/rally_ppo_s1.log 2>&1
echo "=== rally done rc=$? ==="
echo "RALLY LANE DONE"
