#!/bin/bash
# Round-5 lane F: MoE-DT seed 2 on the SkelPlus ROM (verdict item 6 — the
# 149.98 row is n=1), plus an optional gather-dispatch repeat that
# exercises the new capacity-based dispatch in a real training row.
#
# Same protocol as runs_mujoco/dt_rom_moe.log: behavior = the tracked
# SkelPlus PPO checkpoint (runs_mujoco/ckpt_rom_hl5, reboot-surviving) at
# epsilon 0.1, 65k transitions, 15k offline steps, E=4 top-k=2.
#
#   setsid nohup bash tools/run_r5f_dt_moe_s2.sh > runs_mujoco/r5f_lane.log 2>&1 &
#   MOE_DISPATCH=gather EXP=dt_rom_moe_gather SEED=3 bash tools/run_r5f_dt_moe_s2.sh
set -u
cd "$(dirname "$0")/.."

DISPATCH=${MOE_DISPATCH:-dense}
EXP=${EXP:-dt_rom_moe_s2}
SEED=${SEED:-2}

for attempt in 1 2 3; do
  bash tools/wait_tpu.sh
  echo "=== $EXP attempt $attempt dispatch=$DISPATCH $(date -u +%H:%M:%S) ==="
  python -u scripts/dt_rom.py --policy-from runs_mujoco/ckpt_rom_hl5 \
    --policy-epsilon 0.1 --collect-envs 16 --collect-steps 65536 \
    --moe-experts 4 --moe-top-k 2 --moe-dispatch "$DISPATCH" \
    --total-steps 15000 --target-return 200 --rtg-clip 220 \
    --eval-steps 6000 --print-interval 600 \
    --exp-name "$EXP" --seed "$SEED" \
    >> "runs_mujoco/${EXP}.log" 2>&1
  rc=$?
  echo "=== $EXP attempt $attempt rc=$rc $(date -u +%H:%M:%S) ==="
  [ "$rc" -eq 0 ] && break
  sleep 60
done
echo "R5F LANE DONE exp=$EXP"
