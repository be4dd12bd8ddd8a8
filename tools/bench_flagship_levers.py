#!/usr/bin/env python
"""Flagship-throughput lever experiments (round-5 verdict item 2).

Measures the bench.py end-to-end scanned training loop (buffer window
sample + fwd + bwd + fused clip-AdamW, fetch-chained) under one named
lever at a time, so each residual millisecond is attributed to an
attempted, measured change:

  base      — the bench.py flagship config (B=64, chunk=30, f32 LN)
  chunk60   — 60 steps per dispatch (halves the per-dispatch fixed cost)
  ln_bf16   — LayerNorm compute dtype bfloat16 (DTConfig.ln_dtype): halves
              the HBM traffic of the 13 LN chains the RESULTS.md floor
              argument calls HBM-bound
  b128      — batch 128 (the B-scaling lever re-measured post-round-3 opts)
  b128_comb — batch 128 + ln_bf16 + chunk60 (the combined candidate row)
  nodrop    — dropout disabled (attribution only, not a training config)

Usage: python tools/bench_flagship_levers.py <variant>
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def run(variant: str) -> None:
    from mmtrl_tpu.core.config import enable_compile_cache

    enable_compile_cache()

    from mmtrl_tpu.algos.dt import (
        DTTrainConfig,
        create_dt_state,
        make_dt_train_steps,
    )
    from mmtrl_tpu.algos.dt.data import TrajectoryBuffer
    from mmtrl_tpu.models.decision_transformer import DTConfig

    B = 64
    if variant.startswith("b128"):
        B = 128
    elif variant.startswith("b256"):
        B = 256
    K = 30
    chunk = 60 if variant in ("chunk60", "b128_comb", "b256_comb") else 30
    ln_dtype = (
        "bfloat16"
        if variant in ("ln_bf16", "b128_comb", "b256_comb")
        else "float32"
    )
    dropout = 0.0 if variant == "nodrop" else 0.1

    T, N = 6144, 16
    state_shape = (2, 84, 84)
    cfg = DTConfig(
        num_actions=4, context_len=K, d_model=512, n_layers=6, n_heads=4,
        dropout=dropout, max_timestep=64, ln_dtype=ln_dtype,
    )
    tcfg = DTTrainConfig(batch_size=B, total_steps=1000)
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    flat = int(jnp.prod(jnp.asarray(state_shape)))
    buffer = TrajectoryBuffer(
        states=jax.random.uniform(
            k1, (N, T, flat), jnp.bfloat16, minval=-1, maxval=1
        ),
        actions=jax.random.randint(k2, (N, T), 0, 4, dtype=jnp.int32),
        rtg=jax.random.uniform(k2, (N, T), jnp.float32, minval=-30, maxval=10),
        timesteps=jnp.tile(
            jnp.arange(T, dtype=jnp.int32)[None, :] % 64, (N, 1)
        ),
        episode_starts=jnp.zeros((N, T), bool),
        state_shape=state_shape,
    )

    example = jax.jit(lambda buf, k: buf.sample(k, B, K))(buffer, key)
    state = create_dt_state(key, cfg, tcfg, example)
    steps = jax.jit(
        make_dt_train_steps(cfg, B, K, chunk), donate_argnums=(0,)
    )

    state, m = steps(state, buffer, key)
    float(m["dt/loss"])  # fetch = the only real barrier over the tunnel

    n_steps_target = 240
    n_outer = max(1, n_steps_target // chunk)
    t0 = time.perf_counter()
    for i in range(n_outer):
        state, m = steps(state, buffer, jax.random.fold_in(key, 1 + i))
    loss = float(m["dt/loss"])
    dt = (time.perf_counter() - t0) / (n_outer * chunk)
    print(json.dumps({
        "variant": variant,
        "B": B,
        "chunk": chunk,
        "ln_dtype": ln_dtype,
        "ms_per_step": round(dt * 1e3, 3),
        "tokens_per_sec": round(B * 3 * K / dt, 1),
        "final_loss": round(loss, 4),
    }))


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "base")
