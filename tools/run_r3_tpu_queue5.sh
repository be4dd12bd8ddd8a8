#!/bin/bash
# Round-3 TPU queue phase 5, chained behind phase 4: refresh the DT
# batch-size scaling table (RESULTS.md) on the post-optimization step
# (space-to-depth convs, RBG dropout, fused clip+AdamW).
set -u
cd "$(dirname "$0")/.."
if [ -f /tmp/r3_tpu_queue4.pid ]; then
  while kill -0 "$(cat /tmp/r3_tpu_queue4.pid)" 2>/dev/null; do sleep 60; done
fi
for B in 64 128 256; do
  python -u tools/bench_dt_breakdown.py "$B" > "runs_mujoco/dt_breakdown_B$B.log" 2>&1
  echo "B=$B rc=$?"
done
echo "TPU QUEUE5 DONE"
