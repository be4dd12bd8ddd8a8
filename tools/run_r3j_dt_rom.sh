#!/bin/bash
# Round-3 lane 10: offline DT on the REAL SkelPlus cartridge.
# Behavior policy = the finished 6M ROM-trained recurrent CASL PPO agent
# (runs_mujoco/ckpt_rom_hl5) + 10% random mixture; 65k transitions
# collected from the actual emulated cartridge; 15k offline DT steps on
# the TPU; return-conditioned eval back on the cartridge.  This makes
# every stage of the BASELINE "Skeleton+ stereo-audio -> DT" config run
# on the real ROM (the sim DT row's last gap).
#
# Chained behind the ROM seed-1 lane (/tmp/r3b_rom.pid) plus a 2-minute
# grace so the final Orbax save + preserve copy settle.
#
# Launch detached:
#   setsid nohup bash tools/run_r3j_dt_rom.sh > runs_mujoco/r3j_dt_rom_lane.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p runs_mujoco
if [ -f /tmp/r3b_rom.pid ]; then
  while kill -0 "$(cat /tmp/r3b_rom.pid)" 2>/dev/null; do sleep 60; done
fi
sleep 120
# Refresh the preserved checkpoint from the newest save (the watcher may
# lag the lane's final write by up to 5 min).
SRC=$(ls -dt saved_agents/skeleton_plus_native__skel_rom_hl5__* 2>/dev/null | head -1)
if [ -n "${SRC:-}" ] && [ -f "$SRC/_CHECKPOINT_METADATA" ]; then
  rm -rf runs_mujoco/ckpt_rom_hl5.tmp && cp -a "$SRC" runs_mujoco/ckpt_rom_hl5.tmp \
    && rm -rf runs_mujoco/ckpt_rom_hl5 && mv runs_mujoco/ckpt_rom_hl5.tmp runs_mujoco/ckpt_rom_hl5
fi
echo "=== dt_rom_s1: 65k real-ROM transitions -> 15k DT steps -> conditioned eval ==="
python -u scripts/dt_rom.py --policy-from runs_mujoco/ckpt_rom_hl5 \
  --policy-epsilon 0.1 --collect-envs 16 --collect-steps 65536 \
  --total-steps 15000 --target-return 200 --rtg-clip 220 \
  --eval-steps 6000 --print-interval 600 \
  --exp-name dt_rom_s1 --seed 1 > runs_mujoco/dt_rom_s1.log 2>&1
echo "=== dt_rom done rc=$? ==="
echo "DT ROM LANE DONE"
