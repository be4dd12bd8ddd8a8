#!/bin/bash
# One-command restart of the ROM Skeleton+ training lane after a host
# reboot.  Resumes from the git-preserved checkpoint written by
# tools/preserve_ckpt.sh (runs_mujoco/ckpt_rom_hl5) when present —
# continuing the update counter and LR anneal (hostloop.py:99-102,
# tests/test_skeleton_native.py::test_ppo_hostloop_resume_continues) —
# and falls back to a fresh start otherwise.
#
# Launch detached (background Bash tasks die at ~10 min on this host):
#   setsid nohup bash tools/resume_rom.sh > runs_mujoco/r3b_rom_lane.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p runs_mujoco saved_agents
LOAD=""
if [ -f runs_mujoco/ckpt_rom_hl5/_CHECKPOINT_METADATA ]; then
  LOAD="--load-from runs_mujoco/ckpt_rom_hl5"
  echo "resuming ROM lane from runs_mujoco/ckpt_rom_hl5"
fi
python -u scripts/skeleton_plus_ppo.py --backend native --host-loop \
  --num-envs 32 --num-steps 64 --total-timesteps 6000000 \
  --num-minibatches 4 --update-epochs 4 --learning-rate 2.5e-4 \
  --target-kl 0.03 --gamma 0.95 --clip-rewards False --conv-size small \
  --attn-type casl --save-interval 40 --save-dir saved_agents \
  --eval-steps 6000 --print-interval 4 --exp-name skel_rom_hl5 --seed 1 \
  $LOAD >> runs_mujoco/skel_rom_hl5.log 2>&1
echo "rom lane rc=$?"
