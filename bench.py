#!/usr/bin/env python
"""Benchmark: full multimodal decision-transformer offline training step.

Measures trajectory tokens/sec/chip (fwd+bwd+optimizer) for the flagship
audio+video DT on Minecraft2d-shaped trajectories — the BASELINE.json north
star — and compares against the frozen torch-CPU reference measurement
(baselines/cpu_reference.json, same architecture: two-tower CNN state
encoder + 6-layer GPT, B=64, K=30).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import time

import jax
import jax.numpy as jnp


def main():
    from mmtrl_tpu.algos.dt import DTTrainConfig, create_dt_state, make_dt_train_step
    from mmtrl_tpu.models.decision_transformer import DTConfig

    B, K = 64, 30
    cfg = DTConfig(
        num_actions=4, context_len=K, d_model=512, n_layers=6, n_heads=4,
        dropout=0.1, max_timestep=64,
    )
    tcfg = DTTrainConfig(batch_size=B, total_steps=1000)
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    # Realistic data statistics: [-1, 1] frames, random actions/rtg.
    states = jax.random.uniform(
        k1, (B, K, 2, 84, 84), jnp.bfloat16, minval=-1.0, maxval=1.0
    )
    rtg = jax.random.uniform(k2, (B, K), jnp.float32, minval=-30.0, maxval=10.0)
    actions = jax.random.randint(k3, (B, K), 0, 4, dtype=jnp.int32)
    timesteps = jnp.tile(jnp.arange(K, dtype=jnp.int32), (B, 1))
    mask = jnp.ones((B, K), dtype=bool)
    batch = (rtg, states, actions, timesteps, mask)

    state = create_dt_state(key, cfg, tcfg, batch)
    # Donating the train state lets XLA update params/opt-state in place
    # instead of allocating a fresh copy every step (saves HBM traffic).
    step = jax.jit(make_dt_train_step(cfg), donate_argnums=(0,))
    state, m = step(state, batch, key)  # compile
    float(m["dt/loss"])  # FETCH: on the remote-tunnel TPU backend,
    # block_until_ready returns before remote execution completes; only a
    # value fetch actually waits (measured — see RESULTS.md benchmarking
    # methodology).  The loss of step N depends on the whole chain of
    # states, so one final fetch times all N steps.

    n_iters = 30
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, m = step(state, batch, key)
    float(m["dt/loss"])
    dt = (time.perf_counter() - t0) / n_iters
    tokens_per_sec = B * 3 * K / dt

    try:
        baseline = json.load(open("baselines/cpu_reference.json"))[
            "dt_tokens_per_sec_cpu_reference"
        ]
    except Exception:
        baseline = 91.6  # frozen torch-CPU measurement
    print(
        json.dumps(
            {
                "metric": "dt_trajectory_tokens_per_sec_per_chip",
                "value": round(tokens_per_sec, 1),
                "unit": "tokens/sec (fwd+bwd+adamw, B=64 K=30 d=512 L=6, bf16)",
                "vs_baseline": round(tokens_per_sec / baseline, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
