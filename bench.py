#!/usr/bin/env python
"""Benchmark: full multimodal decision-transformer offline training loop.

Measures trajectory tokens/sec/chip for the flagship audio+video DT on
Minecraft2d-shaped trajectories — the BASELINE.json north star — and
compares against the frozen torch-CPU reference measurement
(baselines/cpu_reference.json, same architecture: two-tower CNN state
encoder + 6-layer GPT, B=64, K=30).

Round-3 methodology upgrade: the measured unit is the END-TO-END training
iteration — on-device TrajectoryBuffer window sample + fwd + bwd + fused
clip-AdamW — run as ``make_dt_train_steps``: a ``lax.scan`` over 60
iterations per dispatch (the XLA-native loop scripts/dt_minecraft.py
--scan-chunk uses).  One dispatch + one fetch per 60 steps amortizes the
remote-tunnel fixed dispatch cost (~2.6 ms/call) and makes the number
insensitive to host CPU contention.  This both includes MORE work than the
round-2 flagship (which timed the bare step on a pre-staged batch) and
measures faster: 514k vs 449k tokens/s back-to-back on the same chip
(tools/bench_dt_scan.py).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp

_PROBE = (
    "import jax, jax.numpy as jnp; "
    "x = jnp.ones((128, 128)); print(float((x @ x).sum()))"
)


def wait_for_tpu(budget_s: float) -> None:
    """Block (bounded) until the axon tunnel answers a real round-trip.

    The tunnel has outage windows during which an in-process jax dispatch
    hangs uninterruptibly (tools/wait_tpu.sh exists for the same reason),
    so the probe runs in a SUBPROCESS with a timeout; once it succeeds the
    in-process backend below is safe to initialize.  On a CPU-only host
    (no axon plugin) the probe succeeds immediately on the default backend.
    """
    deadline = time.time() + budget_s
    while True:
        try:
            r = subprocess.run(
                [sys.executable, "-c", _PROBE], timeout=240,
                capture_output=True,
            )
            if r.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        if time.time() >= deadline:
            # Initializing the axon backend in-process during an outage
            # hangs uninterruptibly — a loud fast failure beats eating the
            # caller's whole timeout.
            print(
                "bench: device backend unreachable after probe budget — "
                "aborting instead of hanging", file=sys.stderr, flush=True,
            )
            sys.exit(2)
        print("bench: device backend not answering, retrying...",
              file=sys.stderr, flush=True)
        time.sleep(60)


def main():
    from mmtrl_tpu.core.config import enable_compile_cache

    enable_compile_cache()

    from mmtrl_tpu.algos.dt import (
        DTTrainConfig,
        create_dt_state,
        make_dt_train_steps,
    )
    from mmtrl_tpu.algos.dt.data import TrajectoryBuffer
    from mmtrl_tpu.models.decision_transformer import DTConfig

    # Round-5 flagship config: the measured lever winners
    # (tools/bench_flagship_levers.py, runs_mujoco/lever_*.log) — B=128
    # (+12% over B=64: better MXU fill at S=90), 60 steps/dispatch (+4%:
    # halves the per-dispatch fixed cost), bf16 LayerNorm compute (+2.7%:
    # halves the HBM traffic of the 13 LN chains; loss parity checked in
    # the lever logs).  Together: 572k vs 506k tokens/s back-to-back.
    B, K = 128, 30
    T, N = 6144, 16  # 98k-transition buffer, flagship run dimensions
    state_shape = (2, 84, 84)
    chunk = 60

    cfg = DTConfig(
        num_actions=4, context_len=K, d_model=512, n_layers=6, n_heads=4,
        dropout=0.1, max_timestep=64, ln_dtype="bfloat16",
    )
    tcfg = DTTrainConfig(batch_size=B, total_steps=1000)
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    flat = int(jnp.prod(jnp.asarray(state_shape)))
    # Realistic data statistics: [-1, 1] frames, random actions/rtg, stored
    # stream-major (N, T, F) — the layout the window gather is fast in.
    buffer = TrajectoryBuffer(
        states=jax.random.uniform(k1, (N, T, flat), jnp.bfloat16, minval=-1, maxval=1),
        actions=jax.random.randint(k2, (N, T), 0, 4, dtype=jnp.int32),
        rtg=jax.random.uniform(k2, (N, T), jnp.float32, minval=-30, maxval=10),
        timesteps=jnp.tile(jnp.arange(T, dtype=jnp.int32)[None, :] % 64, (N, 1)),
        episode_starts=jnp.zeros((N, T), bool),
        state_shape=state_shape,
    )

    example = jax.jit(lambda buf, k: buf.sample(k, B, K))(buffer, key)
    state = create_dt_state(key, cfg, tcfg, example)
    # Donating the train state lets XLA update params/opt-state in place
    # instead of allocating a fresh copy every chunk (saves HBM traffic).
    steps = jax.jit(make_dt_train_steps(cfg, B, K, chunk), donate_argnums=(0,))

    state, m = steps(state, buffer, key)  # compile
    float(m["dt/loss"])  # FETCH: on the remote-tunnel TPU backend,
    # block_until_ready returns before remote execution completes; only a
    # value fetch actually waits (measured — see RESULTS.md benchmarking
    # methodology).  The loss of chunk i depends on the whole chain of
    # states, so one final fetch times all iterations.

    n_outer = 4  # 4 × 60 = 240 training steps timed
    t0 = time.perf_counter()
    for i in range(n_outer):
        state, m = steps(state, buffer, jax.random.fold_in(key, 1 + i))
    float(m["dt/loss"])
    dt = (time.perf_counter() - t0) / (n_outer * chunk)
    tokens_per_sec = B * 3 * K / dt

    baseline = 91.6  # torch CPU, same arch + same per-step window sampling
    print(json.dumps({
        "metric": "dt_trajectory_tokens_per_sec_per_chip",
        "value": round(tokens_per_sec, 1),
        "unit": (
            "tokens/sec (end-to-end: buffer sample + fwd+bwd+adamw, "
            "lax.scan 60 steps/dispatch, B=128 K=30 d=512 L=6, bf16)"
        ),
        "vs_baseline": round(tokens_per_sec / baseline, 1),
    }))


if __name__ == "__main__":
    wait_for_tpu(float(os.environ.get("MMTRL_BENCH_WAIT_TPU_S", "1800")))
    main()
