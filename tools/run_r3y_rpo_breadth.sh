#!/bin/bash
# RPO dm_control breadth, part 3: three NEW domains at 2M steps each
# (reference table is 8M; prior rounds showed the band is typically
# reachable at 1/4 budget).  cartpole-balance is the reference's own
# usage example (rpo.md:43); point_mass and hopper diversify the domain
# mix to 10 measured envs.  Chained behind the running reacher-alpha lane
# (single CPU core).
#
# Launch detached:
#   setsid nohup bash tools/run_r3y_rpo_breadth.sh > runs_mujoco/r3y_lane.log 2>&1 &
#   echo $! > /tmp/r3y.pid
set -u
cd "$(dirname "$0")/.."
mkdir -p runs_mujoco

# wait for the reacher alpha=0.01 4M training process (pid recorded at
# lane launch; falls through immediately if it already exited)
if [ -f /tmp/reacher4m.pid ]; then
  while kill -0 "$(cat /tmp/reacher4m.pid)" 2>/dev/null; do sleep 60; done
fi

for env in cartpole-balance point_mass-easy hopper-stand; do
  echo "=== rpo_${env}_2m ==="
  python -u scripts/rpo_continuous_action.py \
    --env-id "dm_control/${env}" --platform cpu --num-envs 1 \
    --total-timesteps 2000000 --seed 1 --print-interval 20 \
    > "runs_mujoco/rpo_${env//-/_}_2m.log" 2>&1
  echo "=== rpo_${env}_2m rc=$? ==="
done
echo "RPO BREADTH-3 LANE DONE"
