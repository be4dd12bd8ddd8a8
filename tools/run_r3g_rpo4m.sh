#!/bin/bash
# Round-3 lane 7: upgrade the three RPO dm_control honest-partials with a
# 4M-step budget (reference numbers are at 8M; the 2M runs were still
# climbing). Chained behind the rpo_bic lane (/tmp/r3b_mujoco2.pid) so the
# single host core stays at ~3 env-stepping processes.
# Reference @8M (docs/rl-algorithms/rpo.md): cheetah-run 565.51+-58.03,
# finger-spin 848.67+-25.21, reacher-easy 716.89+-50.07.
# 2M results here: cheetah 366.7 (climbing, last-5 433), finger-spin 741
# (last-20), reacher-easy 519 (oscillating).
#
# Launch detached:
#   setsid nohup bash tools/run_r3g_rpo4m.sh > runs_mujoco/r3g_rpo4m_lane.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p runs_mujoco
if [ -f /tmp/r3b_mujoco2.pid ]; then
  while kill -0 "$(cat /tmp/r3b_mujoco2.pid)" 2>/dev/null; do sleep 60; done
fi
run() {
  name="$1"; shift
  echo "=== $name: $* ==="
  python -u "$@" >"runs_mujoco/$name.log" 2>&1
  echo "=== $name done rc=$? ==="
}
# --platform cpu --num-envs 1: io_callback cannot cross the axon TPU tunnel.
COMMON="--platform cpu --num-envs 1 --total-timesteps 4000000 --seed 1 --print-interval 20"
run rpo_cheetah_run_4m scripts/rpo_continuous_action.py --env-id dm_control/cheetah-run $COMMON
run rpo_finger_spin_4m scripts/rpo_continuous_action.py --env-id dm_control/finger-spin $COMMON
run rpo_reacher_easy_4m scripts/rpo_continuous_action.py --env-id dm_control/reacher-easy $COMMON
echo "RPO 4M LANE DONE"
