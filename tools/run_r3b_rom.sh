#!/bin/bash
# Round-3 ROM lane restart: the seed-1 ROM Skeleton+ run (skel_rom_hl4) was
# killed by a host reboot at update 1372/2929 (2.81M/6M steps, training
# return -25.2 vs random -34.5) and its checkpoint lived in the gitignored
# saved_agents/, which the reboot wiped. Restart from scratch, same config.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs_mujoco saved_agents
python -u scripts/skeleton_plus_ppo.py --backend native --host-loop \
  --num-envs 32 --num-steps 64 --total-timesteps 6000000 \
  --num-minibatches 4 --update-epochs 4 --learning-rate 2.5e-4 \
  --target-kl 0.03 --gamma 0.95 --clip-rewards False --conv-size small \
  --attn-type casl --save-interval 40 --save-dir saved_agents \
  --eval-steps 6000 --print-interval 4 --exp-name skel_rom_hl5 --seed 1 \
  > runs_mujoco/skel_rom_hl5.log 2>&1
echo "rom restart rc=$?"
echo "ROM LANE DONE"
