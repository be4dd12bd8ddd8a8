"""Host driver for the off-policy trainers (shared by DQN/C51/DDPG/TD3/SAC)."""

from __future__ import annotations

import os
import time
from typing import Callable, Optional

import jax
import numpy as np

try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/mmtrl_jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
except Exception:
    pass

from mmtrl_tpu.core.checkpoint import save_run
from mmtrl_tpu.core.distributed import maybe_initialize_distributed
from mmtrl_tpu.core.metrics import MetricsWriter

maybe_initialize_distributed()


def run_offpolicy(
    init_runner: Callable,
    train_iteration: Callable,
    cfg,
    args,
    run_name: Optional[str] = None,
) -> dict:
    run_name = run_name or (
        f"{args.env_id}__{args.exp_name}__{args.seed}__{int(time.time())}"
    )
    writer = MetricsWriter(run_name, args)
    from mmtrl_tpu.utils.resume import journal_run
    import sys as _sys

    journal_run(run_name, _sys.argv, "running")
    runner = init_runner(jax.random.PRNGKey(args.seed))
    train_iteration = jax.jit(train_iteration)

    start = time.time()
    last_return = 0.0
    for it in range(1, cfg.num_iterations + 1):
        runner, metrics = train_iteration(runner)
        global_step = int(jax.device_get(runner.global_step))
        if it % getattr(args, "print_interval", 1) == 0:
            stats = jax.device_get(runner.stats)
            metrics = jax.device_get(metrics)
            last_return = float(np.mean(stats.returned_episode_returns))
            writer.scalar("charts/episodic_return", last_return, global_step)
            writer.scalar(
                "charts/mean_episodic_return", float(stats.mean_return), global_step
            )
            writer.scalar(
                "charts/episodic_length",
                float(np.mean(stats.returned_episode_lengths)),
                global_step,
            )
            writer.scalars(metrics, global_step)
            sps = writer.sps(global_step)
            print(
                f"iter={it}/{cfg.num_iterations} global_step={global_step} "
                f"episodic_return={last_return:.2f} SPS={sps:.0f}"
            )
        if getattr(args, "save_interval", 0) and it % args.save_interval == 0:
            save_run(runner, run_name, args.save_dir)

    if getattr(args, "save_interval", 0):
        save_run(runner, run_name, args.save_dir)
    journal_run(run_name, _sys.argv, "finished")
    writer.close()
    return {
        "run_name": run_name,
        "global_step": int(jax.device_get(runner.global_step)),
        "episodic_return": last_return,
    }
