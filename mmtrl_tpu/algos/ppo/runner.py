"""Host-side driver shared by all PPO entry scripts.

Owns everything that must stay off-device: TensorBoard logging with the
reference's standardized names (src/train.py:269-279), SPS accounting,
periodic Orbax checkpointing with --save-interval/--save-dir/--load-from
semantics (src/utils.py:23-44,103-108), and optional wandb mirroring.  The
device work is exactly one jitted `train_iteration` call per update.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Optional

import jax
import numpy as np

# Persistent compilation cache: the big scanned programs take minutes to
# compile; cache hits make re-runs start in seconds.
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/mmtrl_jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
except Exception:
    pass

from mmtrl_tpu.core.checkpoint import load_run, save_run
from mmtrl_tpu.core.distributed import maybe_initialize_distributed
from mmtrl_tpu.core.metrics import MetricsWriter

maybe_initialize_distributed()


def run_training(
    init_runner: Callable,
    train_iteration: Callable,
    cfg,
    args,
    run_name: Optional[str] = None,
    video_setup: Optional[tuple] = None,
) -> dict:
    """Drives num_updates iterations; returns final summary dict.

    ``video_setup = (env, step_policy, params_getter, initial_carry)``
    enables ``--capture-video``: a greedy episode GIF under
    videos/<run_name>/ at every checkpoint and at the end (the reference's
    RecordVideo, src/train.py:35,55)."""
    run_name = run_name or f"{args.env_id}__{args.exp_name}__{args.seed}__{int(time.time())}"
    writer = MetricsWriter(run_name, args)
    from mmtrl_tpu.utils.resume import journal_run
    import sys as _sys

    journal_run(run_name, _sys.argv, "running")

    def maybe_capture(runner, tag):
        if video_setup is None or not getattr(args, "capture_video", False):
            return None
        from mmtrl_tpu.utils.video import capture_video

        venv, step_policy, params_getter, carry = video_setup
        path = capture_video(
            venv, step_policy, params_getter(runner.train_state), run_name,
            jax.random.PRNGKey(args.seed + 777), tag=tag,
            initial_carry=carry,
        )
        print(f"recorded rollout video: {path}")
        return path

    if getattr(args, "track", False):
        print(f"tracking to wandb_local/ (zero-egress wandb journal); "
              f"run: {run_name}")

    key = jax.random.PRNGKey(args.seed)
    runner = init_runner(key)
    initial_update = 1
    if getattr(args, "load_from", ""):
        restored = load_run(args.load_from, target=jax.device_get(runner))
        runner = jax.tree_util.tree_map(lambda x: x, restored)
        # Resume the update counter from the checkpoint itself: the
        # optimizer step count divided by optimizer-steps-per-update
        # (reference restores initial_update from the pickle,
        # src/utils.py:40-44, train.py:120-123; here it is derived so no
        # extra flag or payload field is needed).
        spu = getattr(cfg, "opt_steps_per_update", 0)
        if spu:
            opt_step = int(jax.device_get(runner.train_state.step))
            initial_update = opt_step // spu + 1
            print(f"resuming at update {initial_update} (opt step {opt_step})")

    train_iteration = jax.jit(train_iteration)
    global_step = (initial_update - 1) * cfg.batch_size
    start = time.time()
    last_return = 0.0
    profiling = getattr(args, "profile", False)
    for update in range(initial_update, cfg.num_updates + 1):
        if profiling and update == 3:
            jax.profiler.start_trace(f"profiles/{run_name}")
        runner, metrics = train_iteration(runner)
        if profiling and update == 7:
            jax.block_until_ready(metrics)
            jax.profiler.stop_trace()
            print(f"profiler trace written to profiles/{run_name}")
        global_step += cfg.batch_size

        if update % getattr(args, "print_interval", 1) == 0:
            stats = jax.device_get(runner.stats)
            metrics = jax.device_get(metrics)
            mean_return = float(np.mean(stats.returned_episode_returns))
            last_return = mean_return
            writer.scalar("charts/episodic_return", mean_return, global_step)
            writer.scalar(
                "charts/mean_episodic_return", float(stats.mean_return), global_step
            )
            writer.scalar(
                "charts/episodic_length",
                float(np.mean(stats.returned_episode_lengths)),
                global_step,
            )
            writer.scalar(
                "charts/learning_rate",
                _current_lr(cfg, update),
                global_step,
            )
            writer.scalars(metrics, global_step)
            sps = writer.sps(global_step)
            print(
                f"update={update}/{cfg.num_updates} global_step={global_step} "
                f"episodic_return={mean_return:.2f} SPS={sps:.0f}"
            )

        if getattr(args, "save_interval", 0) and update % args.save_interval == 0:
            save_run(runner, run_name, args.save_dir)
            maybe_capture(runner, f"update_{update}")

    if getattr(args, "save_interval", 0):
        save_run(runner, run_name, args.save_dir)
    maybe_capture(runner, "final")
    journal_run(run_name, _sys.argv, "finished")
    writer.close()
    elapsed = time.time() - start
    return {
        "run_name": run_name,
        "global_step": global_step,
        "sps": global_step / max(elapsed, 1e-9),
        "episodic_return": last_return,
        "episode_count": int(jax.device_get(runner.stats.episode_count)),
        # Final runner state (device PyTree) so callers can run post-training
        # evals (e.g. ppg.py's procmaze train/test generalization split).
        "runner": runner,
    }


def _current_lr(cfg, update: int) -> float:
    if not cfg.anneal_lr:
        return cfg.learning_rate
    frac = 1.0 - (update - 1.0) / cfg.num_updates
    return cfg.learning_rate * frac
