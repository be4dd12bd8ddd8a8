#!/bin/bash
# Round-3 MuJoCo lane 3: chained behind the r3b lane (pid in
# /tmp/r3b_mujoco_lane.pid, currently finishing td3_hopper_s1b).
# 1) DDPG Hopper-v4 completion — the last open off-policy-matrix row
#    (the previous attempt died at 461k to a tunnel hang, the retry was
#    SIGTERMed mid-queue; saved_agents/ was wiped by the reboot so this
#    is a fresh 1M run). Reference: torch 1007.44+-148.29, JAX variant
#    1275.28+-209.60 / 1145.05+-41.95 (ddpg.md v2 tables).
# 2) DDPG Walker2d seed 2 — seed-hardening the 1265.32 seed-1 row
#    (reference JAX variant sigma is 568 on this pair; a second seed
#    tells us which side of it we sit on).
set -u
cd "$(dirname "$0")/.."
mkdir -p runs_mujoco
if [ -f /tmp/r3b_mujoco_lane.pid ]; then
  while kill -0 "$(cat /tmp/r3b_mujoco_lane.pid)" 2>/dev/null; do sleep 60; done
fi
run() {
  name="$1"; shift
  echo "=== $name: $* ==="
  python -u "$@" >"runs_mujoco/$name.log" 2>&1
  echo "=== $name done rc=$? ==="
}
COMMON="--host-loop --chunk-size 128 --total-timesteps 1000000 --buffer-size 1000000 --print-interval 50"
run ddpg_hopper_s1b scripts/ddpg_continuous_action.py --env-id Hopper-v4   $COMMON --seed 1
run ddpg_walker_s2  scripts/ddpg_continuous_action.py --env-id Walker2d-v4 $COMMON --seed 2
echo "MUJOCO LANE 3D DONE"
