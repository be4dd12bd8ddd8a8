#!/bin/bash
# Chained behind the MuJoCo lane (pid in /tmp/r3b_mujoco.pid): finish the
# RPO dm_control breadth left open by the reboot — finger-spin (killed at
# 1.06M/2M, last windows 688-730) rerun to the full 2M, then walker-walk
# and cheetah-run (the last two of VERDICT item 4's named five).
# Reference RPO @8M: finger-spin 848.67+-25.21, walker-walk 787.11+-125.97,
# cheetah-run 565.51+-58.03 (docs/rl-algorithms/rpo.md).
set -u
cd "$(dirname "$0")/.."
if [ -f /tmp/r3b_mujoco.pid ]; then
  while kill -0 "$(cat /tmp/r3b_mujoco.pid)" 2>/dev/null; do sleep 60; done
fi
run() {
  name="$1"; shift
  echo "=== $name: $* ==="
  python -u "$@" >"runs_mujoco/$name.log" 2>&1
  echo "=== $name done rc=$? ==="
}
# --platform cpu --num-envs 1 is how every successful dm_control RPO run
# was launched (runs_manifest.jsonl): io_callback cannot cross the axon
# TPU tunnel, so the bridge envs must run on the host CPU platform.
COMMON="--platform cpu --num-envs 1 --total-timesteps 2000000 --seed 1 --print-interval 20"
# walker-walk / cheetah-run first: they have NO RESULTS row yet, while
# finger-spin already has an honest-partial row (640 @ 1.06M) — if wall
# time runs out, the new-coverage runs must have happened first.
run rpo_walker_walk  scripts/rpo_continuous_action.py --env-id dm_control/walker-walk $COMMON
run rpo_cheetah_run  scripts/rpo_continuous_action.py --env-id dm_control/cheetah-run $COMMON
run rpo_finger_spin2 scripts/rpo_continuous_action.py --env-id dm_control/finger-spin $COMMON
# Seed-harden the ball_in_cup-catch headline row (VERDICT weak #3 / item 7):
run rpo_bic_s2 scripts/rpo_continuous_action.py --env-id dm_control/ball_in_cup-catch $COMMON --seed 2
run rpo_bic_s3 scripts/rpo_continuous_action.py --env-id dm_control/ball_in_cup-catch $COMMON --seed 3
echo "MUJOCO LANE 2 DONE"
