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

from mmtrl_tpu.core.checkpoint import load_run, save_run
from mmtrl_tpu.core.distributed import maybe_initialize_distributed
from mmtrl_tpu.core.metrics import MetricsWriter

maybe_initialize_distributed()


def run_offpolicy(
    init_runner: Callable,
    train_iteration: Callable,
    cfg,
    args,
    run_name: Optional[str] = None,
    eval_setup: Optional[tuple] = None,
) -> dict:
    """``eval_setup = (env, act_fn, params_getter)`` enables a final greedy
    evaluation (act_fn(params, obs, key) -> action) after training."""
    run_name = run_name or (
        f"{args.env_id}__{args.exp_name}__{args.seed}__{int(time.time())}"
    )
    writer = MetricsWriter(run_name, args)
    from mmtrl_tpu.utils.resume import journal_run
    import sys as _sys

    journal_run(run_name, _sys.argv, "running")
    runner = init_runner(jax.random.PRNGKey(args.seed))
    initial_it = 1
    if getattr(args, "load_from", ""):
        restored = load_run(args.load_from, target=jax.device_get(runner))
        runner = jax.tree_util.tree_map(lambda x: x, restored)
        # global_step lives in the runner state; derive the iteration
        # counter from it so a resumed run continues instead of restarting.
        steps_per_it = max(1, cfg.total_timesteps // cfg.num_iterations)
        initial_it = int(jax.device_get(runner.global_step)) // steps_per_it + 1
        print(f"resuming at iteration {initial_it}")
    train_iteration = jax.jit(train_iteration)

    start = time.time()
    last_return = 0.0
    for it in range(initial_it, cfg.num_iterations + 1):
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
    result = {
        "run_name": run_name,
        "global_step": int(jax.device_get(runner.global_step)),
        "episodic_return": last_return,
    }
    if eval_setup is not None:
        from mmtrl_tpu.utils.evaluate import evaluate_actions

        env, act_fn, params_getter = eval_setup
        ev = jax.jit(
            lambda p, k: evaluate_actions(env, act_fn, p, k)
        )(params_getter(runner.train_state), jax.random.PRNGKey(args.seed + 10_000))
        ev = {k: float(jax.device_get(v)) for k, v in ev.items()}
        writer.scalar(
            "eval/episodic_return", ev["eval/episodic_return"],
            result["global_step"],
        )
        print(
            f"final greedy eval: return={ev['eval/episodic_return']:.2f} "
            f"over {ev['eval/episodes']:.0f} episodes"
        )
        result["eval_episodic_return"] = ev["eval/episodic_return"]
    journal_run(run_name, _sys.argv, "finished")
    writer.close()
    return result
