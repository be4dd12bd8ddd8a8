"""Multi-host initialization.

The reference scales with torchrun-spawned processes + gloo/nccl
(ppo_atari_multigpu.py:153-163).  On TPU pods, `jax.distributed.initialize`
joins all hosts into one runtime; afterwards `jax.devices()` spans the pod
and the same mesh-sharded programs run unchanged (collectives ride ICI
within a slice and DCN across slices).

Call :func:`maybe_initialize_distributed` once at process start.  It is a
no-op unless a coordinator is configured (MMTRL_COORDINATOR env var or a
TPU-pod environment where JAX can auto-detect), so single-host runs are
unaffected.
"""

from __future__ import annotations

import os


def maybe_initialize_distributed() -> bool:
    """Returns True if a multi-host runtime was initialized."""
    import jax

    coordinator = os.environ.get("MMTRL_COORDINATOR", "")
    num_processes = os.environ.get("MMTRL_NUM_PROCESSES", "")
    process_id = os.environ.get("MMTRL_PROCESS_ID", "")
    try:
        if coordinator:
            jax.distributed.initialize(
                coordinator_address=coordinator,
                num_processes=int(num_processes),
                process_id=int(process_id),
            )
            return True
        if os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") > 0:
            # Multi-worker TPU pod: JAX auto-detects everything.
            jax.distributed.initialize()
            return True
    except Exception as exc:  # pragma: no cover - environment dependent
        print(f"multi-host init skipped: {exc}")
    return False
