#!/bin/bash
# ROM Skeleton+ seed 2 (same config as seed 1), chained behind the seed-1
# process (pid in /tmp/skel_rom_hl4.pid). Seed-hardens the round-3 ROM
# benchmark row (VERDICT weak #3: no headline row with n=1).
set -u
cd "$(dirname "$0")/.."
if [ -f /tmp/skel_rom_hl4.pid ]; then
  while kill -0 "$(cat /tmp/skel_rom_hl4.pid)" 2>/dev/null; do sleep 30; done
fi
nice -n 19 python -u scripts/skeleton_plus_ppo.py --backend native --host-loop \
  --num-envs 32 --num-steps 64 --total-timesteps 6000000 \
  --num-minibatches 4 --update-epochs 4 --learning-rate 2.5e-4 \
  --target-kl 0.03 --gamma 0.95 --clip-rewards False --conv-size small \
  --attn-type casl --save-interval 40 --save-dir saved_agents \
  --eval-steps 6000 --print-interval 4 --exp-name skel_rom_s2 --seed 2 \
  > runs_mujoco/skel_rom_s2.log 2>&1
echo "rom seed2 rc=$?"
