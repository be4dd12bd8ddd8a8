#!/bin/bash
# Checkpoint preservation watcher for the ROM Skeleton+ lane.
#
# The host VM can reboot at any time and restores the filesystem from the
# last git COMMIT — gitignored paths (saved_agents/) and uncommitted files
# are wiped. That already killed one 2.81M-step ROM run (skel_rom_hl4).
# This watcher copies the newest skel_rom_hl5 Orbax checkpoint into a
# TRACKED path every 5 minutes; the operator commits it periodically, so
# after a reboot the lane resumes with
#   scripts/skeleton_plus_ppo.py ... --load-from runs_mujoco/ckpt_rom_hl5
# instead of restarting from step 0.
#
# Only copies when the checkpoint metadata is >60s old (Orbax write done).
set -u
cd "$(dirname "$0")/.."
DEST=runs_mujoco/ckpt_rom_hl5
while true; do
  SRC=$(ls -dt saved_agents/skeleton_plus_native__skel_rom_hl5__* 2>/dev/null | head -1)
  if [ -n "${SRC:-}" ] && [ -f "$SRC/_CHECKPOINT_METADATA" ]; then
    age=$(( $(date +%s) - $(stat -c %Y "$SRC/_CHECKPOINT_METADATA") ))
    if [ "$age" -gt 60 ]; then
      # Swap via two renames so a concurrent `git add` can never see a
      # half-copied tree (ADVICE r3: torn-checkpoint commit risk); the copy
      # itself happens into the untracked .tmp path.
      rm -rf "$DEST.tmp" "$DEST.old" \
        && cp -a "$SRC" "$DEST.tmp" \
        && { [ -e "$DEST" ] && mv "$DEST" "$DEST.old" || true; } \
        && mv "$DEST.tmp" "$DEST" \
        && rm -rf "$DEST.old"
    fi
  fi
  sleep 300
done
