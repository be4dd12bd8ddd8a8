#!/bin/bash
# Round-3 follow-on CPU queue: waits for the primary queue (pid in
# /tmp/r3_queue.pid) to exit, then seed-hardens the MountainCar off-policy
# rows (VERDICT weak #4: C51 greedy -200/-121.3/-200 and DQN -200 lean on
# the seed lottery; more seeds settle the parity claim).
set -u
cd "$(dirname "$0")/.."
mkdir -p runs_mujoco
if [ -f /tmp/r3_queue.pid ]; then
  while kill -0 "$(cat /tmp/r3_queue.pid)" 2>/dev/null; do sleep 60; done
fi
run() {
  name="$1"; shift
  echo "=== $name: $* ==="
  nice -n 19 python -u "$@" >"runs_mujoco/$name.log" 2>&1
  echo "=== $name done rc=$? ==="
}
for seed in 4 5 6; do
  run c51_mc_s$seed scripts/c51.py --platform cpu --env-id MountainCar-v0 \
    --total-timesteps 500000 --seed $seed --print-interval 50
done
for seed in 2 3; do
  run dqn_mc_s$seed scripts/dqn.py --platform cpu --env-id MountainCar-v0 \
    --total-timesteps 500000 --seed $seed --print-interval 50
done
echo "R3 CPU QUEUE2 DONE"
