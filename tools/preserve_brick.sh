#!/bin/bash
# Checkpoint preservation watcher for the round-4 BRICK value-learning
# finals (same rationale as preserve_ckpt.sh: host reboots restore the
# tree from the last git commit and wipe gitignored saved_agents/, which
# already cost this lane its 240k DQN checkpoint twice).  Copies the
# newest Orbax checkpoint of each lane into a TRACKED path every 5 min
# via the two-rename swap so a concurrent `git add` never sees a torn
# tree.  The operator commits the tracked copies periodically.
#
#   setsid nohup bash tools/preserve_brick.sh > runs_mujoco/preserve_brick.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

preserve() {
  local prefix="$1" dest="$2"
  local src
  src=$(ls -dt saved_agents/${prefix}__* 2>/dev/null | head -1)
  [ -z "${src:-}" ] && return 0
  [ -f "$src/_CHECKPOINT_METADATA" ] || return 0
  local age=$(( $(date +%s) - $(stat -c %Y "$src/_CHECKPOINT_METADATA") ))
  [ "$age" -le 60 ] && return 0
  # Skip if the tracked copy is already this write (mtime match).
  if [ -f "$dest/_CHECKPOINT_METADATA" ] && \
     [ "$(stat -c %Y "$src/_CHECKPOINT_METADATA")" = "$(stat -c %Y "$dest/_CHECKPOINT_METADATA")" ]; then
    return 0
  fi
  rm -rf "$dest.tmp" "$dest.old" \
    && cp -a "$src" "$dest.tmp" \
    && { [ -e "$dest" ] && mv "$dest" "$dest.old" || true; } \
    && mv "$dest.tmp" "$dest" \
    && rm -rf "$dest.old" \
    && echo "preserved $src -> $dest $(date -u +%H:%M:%S)"
}

while true; do
  preserve brick_native__dqn_brick_f runs_mujoco/ckpt_brick_dqn
  preserve brick_native__c51_brick_f runs_mujoco/ckpt_brick_c51
  preserve brick_native__dqn_brick_s2 runs_mujoco/ckpt_brick_dqn_s2
  preserve brick_native__c51_brick_s2 runs_mujoco/ckpt_brick_c51_s2
  sleep 300
done
