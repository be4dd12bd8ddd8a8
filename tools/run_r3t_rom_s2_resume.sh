#!/bin/bash
# Relaunch of the ROM Skeleton+ seed-2 lane after the tunnel outage killed
# it at 1.45M/6M.  Waits for the TPU, then resumes from the git-preserved
# checkpoint (runs_mujoco/ckpt_rom_s2) with the exact seed-1 headline
# config (tools/run_r3f_rom_s2.sh).  The train command runs inside a
# retry loop: a tunnel flap kills the process (the in-process jax runtime
# cannot recover once the backend gives up), but the preservation loop
# means a relaunch only loses <=5 min of progress.
#
# Launch detached:
#   setsid nohup bash tools/run_r3t_rom_s2_resume.sh > runs_mujoco/r3t_lane.log 2>&1 &
#   echo $! > /tmp/r3t.pid
set -u
cd "$(dirname "$0")/.."
mkdir -p runs_mujoco saved_agents

# Preservation loop: copy the newest seed-2 Orbax save into the tracked path
# every 5 min so a reboot/outage only loses minutes.
(
  while true; do
    SRC=$(ls -dt saved_agents/skeleton_plus_native__skel_rom_s2__* 2>/dev/null | head -1)
    if [ -n "${SRC:-}" ] && [ -f "$SRC/_CHECKPOINT_METADATA" ]; then
      age=$(( $(date +%s) - $(stat -c %Y "$SRC/_CHECKPOINT_METADATA") ))
      if [ "$age" -gt 60 ]; then
        rm -rf runs_mujoco/ckpt_rom_s2.tmp \
          && cp -a "$SRC" runs_mujoco/ckpt_rom_s2.tmp \
          && rm -rf runs_mujoco/ckpt_rom_s2 \
          && mv runs_mujoco/ckpt_rom_s2.tmp runs_mujoco/ckpt_rom_s2
      fi
    fi
    sleep 300
  done
) &
PRESERVE_PID=$!

for attempt in 1 2 3 4 5; do
  bash tools/wait_tpu.sh
  LOAD=""
  if [ -f runs_mujoco/ckpt_rom_s2/_CHECKPOINT_METADATA ]; then
    LOAD="--load-from runs_mujoco/ckpt_rom_s2"
  fi
  echo "=== skel_rom_s2 attempt $attempt (resume: ${LOAD:-fresh}) ==="
  python -u scripts/skeleton_plus_ppo.py --backend native --host-loop \
    --num-envs 32 --num-steps 64 --total-timesteps 6000000 \
    --num-minibatches 4 --update-epochs 4 --learning-rate 2.5e-4 \
    --target-kl 0.03 --gamma 0.95 --clip-rewards False --conv-size small \
    --attn-type casl --save-interval 40 --save-dir saved_agents \
    --eval-steps 6000 --print-interval 4 --exp-name skel_rom_s2 --seed 2 \
    $LOAD >> runs_mujoco/skel_rom_s2.log 2>&1
  rc=$?
  echo "rom seed2 attempt $attempt rc=$rc"
  [ "$rc" -eq 0 ] && break
  sleep 60
done
kill "$PRESERVE_PID" 2>/dev/null
echo "ROM SEED2 RESUME LANE DONE"
