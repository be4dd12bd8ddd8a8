"""Checkpoint / resume with the reference's save-interval/load-from semantics.

The reference pickles the whole ``{agent, optimizer, args, global_step,
episode_count, initial_update}`` dict to ``<save_dir>/<run_name>.pkl``
(reference: src/utils.py:23-44) driven by ``--save-interval/--save-dir/
--load-from`` flags (src/utils.py:103-108).  Here the same CLI surface is
kept but the payload is a PyTree of (params, opt_state, env/rollout state,
PRNG key, counters) serialized with Orbax — restartable on any device
topology, no Python object pickling.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _path(save_dir: str, run_name: str) -> str:
    return os.path.abspath(os.path.join(save_dir, run_name))


def save_run(state: Any, run_name: str, save_dir: str = "saved_agents") -> str:
    """Save a training-state PyTree; overwrites any previous save of the run.

    Crash-safe: the tree is written to a temp sibling and swapped in with
    two renames, so a kill mid-save leaves the previous checkpoint intact
    (previously ``force=True`` deleted it before writing — a periodic save
    interrupted at the wrong moment destroyed the only on-disk copy; the
    round-4 BRICK finals survived only via external preserve copies).
    The ``_tmp_``/``_old_`` prefixes keep the transient dirs out of the
    lane scripts' ``<run_name>*`` checkpoint globs.
    """
    path = _path(save_dir, run_name)
    tmp = _path(save_dir, f"_tmp_{run_name}")
    old = _path(save_dir, f"_old_{run_name}")
    os.makedirs(save_dir, exist_ok=True)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(tmp, jax.device_get(state), force=True)
    import shutil

    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    if os.path.exists(old):
        shutil.rmtree(old)
    print(f"saved run to {path}")
    return path


def load_run(path: str, target: Optional[Any] = None) -> Any:
    """Restore a training-state PyTree.

    ``target`` (an abstract/example PyTree) restores with correct dtypes,
    shapes, and shardings; without it, raw arrays come back.
    """
    ckptr = ocp.PyTreeCheckpointer()
    restore_args = None
    if target is not None:
        restore_args = ocp.args.PyTreeRestore(item=target)
        state = ckptr.restore(os.path.abspath(path), args=restore_args)
    else:
        state = ckptr.restore(os.path.abspath(path))
    print(f"loaded run from {path}")
    return state
