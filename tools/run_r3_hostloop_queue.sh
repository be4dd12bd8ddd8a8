#!/bin/bash
# Round-3 off-policy MuJoCo matrix (VERDICT missing #3): SAC/TD3/DDPG on
# Walker2d-v4 and Hopper-v4, 1M steps, reference defaults, via the host-loop
# mode (host envs + TPU chunk updates). Logs to runs_mujoco/.
# Reference 1M targets (docs/rl-algorithms, v2 envs):
#   sac.md:  Walker2d 4418.15+-592.82 | Hopper 2685.76+-762.16
#   td3.md:  Walker2d 3851.55+-335.29 (jax-TPU 4107.63+-173.93)
#            Hopper   3162.21+-261.08 (jax 3564.07+-114.74)
#   ddpg.md: Walker2d 1661.14+-250.01 | Hopper 1007.44+-148.29
set -u
cd "$(dirname "$0")/.."
mkdir -p runs_mujoco
run() {
  name="$1"; shift
  echo "=== $name: $* ==="
  python -u "$@" >"runs_mujoco/$name.log" 2>&1
  echo "=== $name done rc=$? ==="
}
COMMON="--host-loop --chunk-size 128 --total-timesteps 1000000 --buffer-size 1000000 --seed 1 --print-interval 50"
run sac_walker_s1  scripts/sac_continuous_action.py  --env-id Walker2d-v4 $COMMON
run sac_hopper_s1  scripts/sac_continuous_action.py  --env-id Hopper-v4   $COMMON
run td3_walker_s1  scripts/td3_continuous_action.py  --env-id Walker2d-v4 $COMMON
run td3_hopper_s1  scripts/td3_continuous_action.py  --env-id Hopper-v4   $COMMON
run ddpg_walker_s1 scripts/ddpg_continuous_action.py --env-id Walker2d-v4 $COMMON
run ddpg_hopper_s1 scripts/ddpg_continuous_action.py --env-id Hopper-v4   $COMMON
echo "HOSTLOOP QUEUE DONE"
